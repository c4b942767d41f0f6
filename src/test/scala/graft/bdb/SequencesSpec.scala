package graft.bdb

import graft.SparkSpec
import org.apache.spark.sql.Row

class SequencesSpec extends SparkSpec {

  private def frames(n: Int) = {
    import spark.implicits._
    (1 to n).map(f => (1L, 1L, 10L, f.toLong, f.toDouble, f * 2.0))
      .toDF("game_id", "play_id", "nfl_id", "frame_id", "f1", "f2")
  }

  private def seqOf(row: Row): collection.Seq[collection.Seq[Double]] =
    row.getAs[collection.Seq[collection.Seq[Double]]]("seq")

  test("short trajectory zero-pads the tail to maxLen") {
    val out = Sequences.build(frames(3), Seq("f1", "f2"), maxLen = 5).head()
    assert(out.getAs[Int]("seq_len") === 3)
    val s = seqOf(out)
    assert(s.length === 5)
    assert(s(0) === Seq(1.0, 2.0))
    assert(s(2) === Seq(3.0, 6.0))
    assert(s(3) === Seq(0.0, 0.0))
    assert(s(4) === Seq(0.0, 0.0))
    assert(out.getAs[collection.Seq[Double]]("mask") === Seq(1.0, 1.0, 1.0, 0.0, 0.0))
  }

  test("long trajectory keeps the LAST maxLen frames (reference tail-keep)") {
    val out = Sequences.build(frames(8), Seq("f1", "f2"), maxLen = 5).head()
    assert(out.getAs[Int]("seq_len") === 5)
    val s = seqOf(out)
    assert(s.length === 5)
    assert(s.head === Seq(4.0, 8.0)) // frames 4..8 kept
    assert(s.last === Seq(8.0, 16.0))
    assert(out.getAs[collection.Seq[Double]]("mask").forall(_ === 1.0))
  }

  test("exact-length trajectory: no padding, full mask") {
    val out = Sequences.build(frames(5), Seq("f1", "f2"), maxLen = 5).head()
    assert(seqOf(out).length === 5)
    assert(seqOf(out).head === Seq(1.0, 2.0))
    assert(out.getAs[collection.Seq[Double]]("mask").forall(_ === 1.0))
  }

  test("typed Aggregator variant produces identical output to the HOF form") {
    for (n <- Seq(3, 5, 8)) {
      val viaHof = Sequences.build(frames(n), Seq("f1", "f2"), maxLen = 5).head()
      val viaAgg = Sequences.buildTyped(frames(n), Seq("f1", "f2"), maxLen = 5).head()
      assert(viaAgg.getAs[Int]("seq_len") === viaHof.getAs[Int]("seq_len"), s"n=$n")
      assert(seqOf(viaAgg) === seqOf(viaHof), s"n=$n")
      assert(viaAgg.getAs[collection.Seq[Double]]("mask") ===
        viaHof.getAs[collection.Seq[Double]]("mask"), s"n=$n")
    }
  }
}
