package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ScaleGen contract: K replicas with disjoint-but-consistent key spaces —
  * the properties Bench's sf1 profile and the scale sweep rely on.
  */
class ScaleGenSpec extends SparkSpec {

  private val src = "/root/testdata/sf0.001"

  test("replication preserves counts, key disjointness, and FK consistency") {
    val dst = java.nio.file.Files.createTempDirectory("sg").toString + "/sf"
    val k = 3
    ScaleGen.generate(spark, src, dst, k)

    def cnt(base: String, t: String): Long =
      spark.read.parquet(s"$base/$t.parquet").count()

    // copy-as-is dims unchanged; offset tables exactly k x
    assert(cnt(dst, "region") === cnt(src, "region"))
    assert(cnt(dst, "nation") === cnt(src, "nation"))
    for (t <- Seq("customer", "orders", "lineitem", "events", "documents",
        "embeddings"))
      assert(cnt(dst, t) === k * cnt(src, t), s"$t should replicate ${k}x")

    // primary keys stay unique (replica offsets are disjoint)
    val orders = spark.read.parquet(s"$dst/orders.parquet")
    assert(orders.select("o_orderkey").distinct().count() === orders.count())

    // referential consistency: every replicated order still finds its
    // customer — the FK was shifted by the SAME stride as the PK
    val cust = spark.read.parquet(s"$dst/customer.parquet")
    val dangling = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti").count()
    assert(dangling === 0L, s"$dangling orders lost their customer")

    // join cardinality scales linearly, not quadratically (keys disjoint
    // across replicas): |orders ⋈ customer| at k replicas = k x base
    val baseJoin = spark.read.parquet(s"$src/orders.parquet")
      .join(spark.read.parquet(s"$src/customer.parquet"),
        col("o_custkey") === col("c_custkey")).count()
    val dstJoin = orders.join(cust,
      orders("o_custkey") === cust("c_custkey")).count()
    assert(dstJoin === k * baseJoin)

    // document text gets a per-replica suffix (near-dup counts scale
    // linearly) and n_chars tracks it
    val docs = spark.read.parquet(s"$dst/documents.parquet")
    assert(docs.select("text").distinct().count() === docs.count()
      || docs.filter(col("text").endsWith(" replica1")).count() > 0)
    val mism = docs.filter(length(col("text")) =!= col("n_chars")).count()
    assert(mism === 0L, s"$mism docs with n_chars out of sync after suffixing")
  }

  test("ensure() is idempotent via the marker file") {
    val dst = java.nio.file.Files.createTempDirectory("sg2").toString + "/sf"
    ScaleGen.ensure(spark, src, dst, 2)
    val t0 = new java.io.File(s"$dst/orders.parquet").lastModified()
    ScaleGen.ensure(spark, src, dst, 2) // must NOT regenerate
    assert(new java.io.File(s"$dst/orders.parquet").lastModified() === t0)
  }
}
