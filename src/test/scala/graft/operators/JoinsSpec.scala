package graft.operators

import graft.SparkSpec

class JoinsSpec extends SparkSpec {

  test("onCommonKeys resolves the key intersection at plan-build time (J9)") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L, 1.0), (1L, 2L, 11L, 2.0))
      .toDF("game_id", "play_id", "nfl_id", "v")
    val rightPlayLevel = Seq((1L, 1L, "C"), (1L, 2L, "I"))
      .toDF("game_id", "play_id", "pass_result")
    val candidates = Seq("game_id", "play_id", "nfl_id", "frame_id")
    val joined = Joins.onCommonKeys(left, rightPlayLevel, candidates)
    assert(joined.count() === 2)
    assert(joined.columns.count(_ == "game_id") === 1) // keys deduplicated
    val noKeys = Seq((1, "x")).toDF("other", "y")
    intercept[IllegalArgumentException] {
      Joins.onCommonKeys(left, noKeys, candidates)
    }
  }

  test("asOfJoin: backward merge_asof semantics per key") {
    import spark.implicits._
    val trades = Seq(
      ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 35L, 99.0),
      ("B", 15L, 50.0))
      .toDF("sym", "trade_t", "px")
    val quotes = Seq(
      ("A", 5L, 99.5), ("A", 20L, 100.5), ("A", 30L, 98.5),
      ("B", 40L, 51.0))
      .toDF("sym", "quote_t", "bid")
    val joined = Joins.asOfJoin(trades, quotes, Seq("sym"), "trade_t", "quote_t")
      .orderBy("sym", "trade_t")
      .select("sym", "trade_t", "px", "bid").collect()
    // A@10 → quote@5; A@20 → quote@20 (tie: right wins); A@35 → quote@30
    assert(joined(0).getAs[Double]("bid") === 99.5)
    assert(joined(1).getAs[Double]("bid") === 100.5)
    assert(joined(2).getAs[Double]("bid") === 98.5)
    // B@15: no earlier quote → null
    assert(joined(3).isNullAt(3))
    assert(joined.length === 4) // row count preserved
  }

  test("asOfJoin keeps sub-second timestamp precision (no whole-second truncation)") {
    import spark.implicits._
    import java.sql.Timestamp
    // trade at 10:00:00.100; quotes at 10:00:00.050 (before) and
    // 10:00:00.900 (same SECOND but 800 ms AFTER the trade). A
    // seconds-truncating key would treat the .900 quote as <= and attach it.
    val t = (ms: Long) => new Timestamp(1700000000000L + ms)
    val trades = Seq(("A", t(100), 10.0)).toDF("sym", "trade_t", "px")
    val quotes = Seq(("A", t(50), 1.0), ("A", t(900), 2.0))
      .toDF("sym", "quote_t", "bid")
    val joined = Joins.asOfJoin(trades, quotes, Seq("sym"), "trade_t", "quote_t")
      .collect()
    assert(joined.length === 1)
    assert(joined(0).getAs[Double]("bid") === 1.0)
  }

  test("asOfJoin rejects colliding value columns") {
    import spark.implicits._
    val l = Seq(("A", 1L, 1.0)).toDF("k", "t", "v")
    val r = Seq(("A", 1L, 2.0)).toDF("k", "rt", "v")
    intercept[IllegalArgumentException] {
      Joins.asOfJoin(l, r, Seq("k"), "t", "rt")
    }
  }
}
