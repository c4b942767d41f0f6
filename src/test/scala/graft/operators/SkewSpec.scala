package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin preserves join semantics under a hot key") {
    import spark.implicits._
    // 90% of big rows share key 1 (the skew), small is a dim table
    val big = ((1 to 900).map(_ => (1L, "hot")) ++ (1 to 100).map(i => (i.toLong % 7 + 2, "cold")))
      .toDF("k", "side")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")
    val expected = big.join(small, Seq("k")).count()
    val salted = Skew.saltedJoin(big, small, Seq("k"), nSalts = 8)
    assert(salted.count() === expected)
    // content equality, not just counts
    val diff = big.join(small, Seq("k")).groupBy("k").count().as("a")
      .except(salted.groupBy("k").count())
    assert(diff.count() === 0)
  }

  test("saltedJoin rejects outer types that would replicate the small side") {
    import spark.implicits._
    val big = Seq((1L, "x")).toDF("k", "side")
    val small = Seq((1L, "dim"), (2L, "unmatched")).toDF("k", "name")
    for (jt <- Seq("right", "right_outer", "full", "full_outer")) {
      intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, small, Seq("k"), nSalts = 4, joinType = jt)
      }
    }
    // left outer stays exact: unmatched BIG rows appear once
    val bigL = Seq((1L, "x"), (99L, "nomatch")).toDF("k", "side")
    val left = Skew.saltedJoin(bigL, small, Seq("k"), nSalts = 4, joinType = "left")
    assert(left.count() === 2)
    assert(left.filter(col("name").isNull).count() === 1)
  }

  test("hotKeys surfaces the dominant key") {
    import spark.implicits._
    val big = ((1 to 900).map(_ => 1L) ++ (1 to 100).map(_.toLong + 1)).toDF("k")
    val top = Skew.hotKeys(big, Seq("k"), 1).head()
    assert(top.getLong(0) === 1L)
    assert(top.getLong(1) === 900L)
  }

  test("bandHotKeys surfaces an LSH mega-bucket in a skewed corpus") {
    import spark.implicits._
    // 200 docs that are the SAME boilerplate (a license-header mega-bucket:
    // identical text → identical signature → all 4 band buckets hold all
    // 200 ids) + 50 distinct organic docs that should not dominate
    val boiler = "copyright notice all rights reserved permission is hereby " +
      "granted free of charge to any person obtaining a copy of this software"
    val docs = ((1 to 200).map(i => (i.toLong, boiler)) ++
      (1 to 50).map { i =>
        // mostly-unique token soup per doc: low pairwise Jaccard by design
        (200L + i, (1 to 15)
          .map(j => s"tok${(i * 131 + j * 7919) % 99991}z${i * 31 + j}")
          .mkString(" "))
      }).toDF("doc_id", "text")

    val hot = MinHash.bandHotKeys(docs, topK = MinHash.NBands + 2).collect()
    // the mega-bucket fills the top NBands slots — one per band, 200 each
    val top = hot.take(MinHash.NBands)
    assert(top.forall(_.getAs[Long]("cnt") === 200L),
      s"expected the boilerplate bucket (200 docs) in every band, got " +
        hot.map(r => (r.getAs[Int]("band"), r.getAs[Long]("cnt"))).toSeq)
    assert(top.map(_.getAs[Int]("band")).toSet === (0 until MinHash.NBands).toSet)
    // organic collisions stay an order of magnitude below the mega-bucket
    // (a handful of docs can share a band bucket — that's LSH working)
    assert(hot.drop(MinHash.NBands).forall(_.getAs[Long]("cnt") <= 10L))
  }
}
