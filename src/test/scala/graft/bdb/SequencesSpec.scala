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

  test("buildFlat ≡ flatten(slice(build.seq, 1, seq_len)) bit-for-bit " +
      "(short / exact / long; double and float; packed and named)") {
    import org.apache.spark.sql.functions.{col, expr, array}
    for (n <- Seq(1, 3, 5, 8); vt <- Seq("double", "float")) {
      // named-features form
      val padded = Sequences.build(frames(n), Seq("f1", "f2"), maxLen = 5,
        valueType = vt)
        .select(col("seq_len"),
          expr("flatten(slice(seq, 1, seq_len))").as("flat")).head()
      val flat = Sequences.buildFlat(frames(n), Seq("f1", "f2"), maxLen = 5,
        valueType = vt).select(col("seq_len"), col("flat")).head()
      assert(flat.getAs[Int]("seq_len") === padded.getAs[Int]("seq_len"),
        s"n=$n vt=$vt")
      assert(flat.getSeq[Any](1) === padded.getSeq[Any](1), s"n=$n vt=$vt")
      // packed (pre-arrayed) form — the m_lstm_infer shape
      val fp = frames(n).select(col("game_id"), col("play_id"),
        col("nfl_id"), col("frame_id"), array(col("f1"), col("f2")).as("farr"))
      val paddedP = Sequences.build(fp, Seq("farr"), maxLen = 5, valueType = vt)
        .select(col("seq_len"),
          expr("flatten(slice(seq, 1, seq_len))").as("flat")).head()
      val flatP = Sequences.buildFlat(fp, Seq("farr"), maxLen = 5,
        valueType = vt).select(col("seq_len"), col("flat")).head()
      assert(flatP.getAs[Int]("seq_len") === paddedP.getAs[Int]("seq_len"),
        s"packed n=$n vt=$vt")
      assert(flatP.getSeq[Any](1) === paddedP.getSeq[Any](1),
        s"packed n=$n vt=$vt")
    }
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
