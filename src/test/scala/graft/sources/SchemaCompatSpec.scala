package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The testdata contract gate (round-7 postmortem): real testdata must pass
  * clean, and a drifted column must produce ONE message naming the table,
  * column, arrival type, and the accepted set.
  */
class SchemaCompatSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("current testdata is schema-compatible (all 10 tables)") {
    val ps = SchemaCompat.problems(spark, dir)
    assert(ps.isEmpty, s"unexpected drift:\n${ps.mkString("\n")}")
  }

  test("a mis-typed column is named with its arrival type and the accepted set") {
    val tmp = java.nio.file.Files.createTempDirectory("schema_drift").toString
    // Copy every table through unchanged, then break exactly one column:
    // events.ts → string (a type microsCol can NEVER normalize).
    Tables.names.foreach { t =>
      val df = Tables.read(spark, dir, t)
      val out = if (t == "events") df.withColumn("ts", col("ts").cast("string")) else df
      out.write.parquet(s"$tmp/$t.parquet")
    }
    val ps = SchemaCompat.problems(spark, tmp)
    assert(ps.size === 1, s"expected exactly the injected drift, got:\n${ps.mkString("\n")}")
    assert(ps.head.contains("events.ts"))
    assert(ps.head.contains("string"))
    assert(ps.head.contains("timestamp | timestamp_ntz | bigint"))
    val e = intercept[IllegalStateException](SchemaCompat.preflight(spark, tmp))
    assert(e.getMessage.contains("events.ts"))
  }

  test("a missing column is reported as missing, not as a type mismatch") {
    val tmp = java.nio.file.Files.createTempDirectory("schema_missing").toString
    Tables.documents(spark, dir).drop("lang").write.parquet(s"$tmp/documents.parquet")
    val ps = SchemaCompat.problems(spark, tmp)
    assert(ps.exists(p => p.contains("documents.lang") && p.contains("MISSING")))
  }
}
