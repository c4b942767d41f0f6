package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenGramHashSpec extends SparkSpec {

  test("rolling gram hashes equal direct per-window recomputation") {
    import spark.implicits._
    // the rolling advance (subtract-top, multiply, add) must agree with a
    // from-scratch fold over every window — catches rolloff bugs
    val toks = (1 to 40).map(i => s"tok$i")
    val df = Seq(toks).toDF("t")
    val rolled = df.select(GraftFunctions.token_gram_hash(col("t"), lit(8)))
      .head().getSeq[Long](0)
    assert(rolled.length === 33)
    val direct = (0 until 33).map { i =>
      Seq(toks.slice(i, i + 8)).toDF("t")
        .select(GraftFunctions.token_gram_hash(col("t"), lit(8)))
        .head().getSeq[Long](0).head
    }
    assert(rolled === direct)
  }

  test("equal windows hash equal; different windows differ") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c", "d"), // windows: abc, bcd
      Seq("x", "a", "b", "c"), // windows: xab, abc
      Seq("a", "b", "x", "c")
    ).toDF("t")
    val hs = df.select(GraftFunctions.token_gram_hash(col("t"), lit(3)))
      .collect().map(_.getSeq[Long](0))
    assert(hs(0)(0) === hs(1)(1)) // shared "a b c" window
    assert(hs(0)(0) !== hs(2)(0)) // "a b x" differs
    // token boundaries matter: ["ab","c"] must not equal ["a","bc"]
    val b = Seq(Seq("ab", "c"), Seq("a", "bc"))
      .toDF("t").select(GraftFunctions.token_gram_hash(col("t"), lit(2)))
      .collect().map(_.getSeq[Long](0).head)
    assert(b(0) !== b(1))
  }

  test("short and empty docs yield empty arrays; null is null") {
    import spark.implicits._
    val df = Seq(Seq("one", "two"), Seq.empty[String]).toDF("t")
    val hs = df.select(GraftFunctions.token_gram_hash(col("t"), lit(8)))
      .collect().map(_.getSeq[Long](0))
    assert(hs.forall(_.isEmpty))
    val n = spark.sql("SELECT token_gram_hash(CAST(NULL AS ARRAY<STRING>), 8)")
      .head()
    assert(n.isNullAt(0))
  }
}
