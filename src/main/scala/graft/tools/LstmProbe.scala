package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the m_lstm_infer pipeline — where do
  * the seconds go between feature select, sequence assembly, and the
  * forward-pass UDF? */
object LstmProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val model = graft.ml.KerasLstm.load(
      "/root/reference/models/convergence_lstm_model_BlindPhysics_Completed_Pass.h5")

    val base = Seq(
      col("l_quantity") % 100, col("l_extendedprice") % 53,
      col("l_discount") * 10, col("l_tax") * 10,
      (col("l_partkey") % 7).cast("double"))
    val named = base.zipWithIndex.map { case (c, k) => c.as(s"f$k") }
    val derived = (5 until model.nFeatures).map(k =>
      sin(base(k % 5) + lit(k)).as(s"f$k"))
    def wide = graft.sources.Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 4 === 0)
      .select(Seq(col("l_orderkey").as("game_id"), lit(0L).as("play_id"),
        lit(0L).as("nfl_id"), col("l_linenumber").cast("long").as("frame_id"))
        ++ named ++ derived: _*)
    def seqs = graft.bdb.Sequences.build(
      wide, (0 until model.nFeatures).map(k => s"f$k"), maxLen = 7)

    def timed(name: String)(f: => Long): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[lstmprobe] $name%-24s median ${ts(1)}%.3f s")
    }

    timed("features only") { wide.count() }
    timed("+ sequence assembly") { seqs.count() }
    timed("+ forward pass") {
      graft.ml.KerasLstm.scoreSequences(seqs, model,
        Seq("game_id", "play_id", "nfl_id")).count()
    }
    timed("+ final agg (full query)") {
      graft.queries.Registry.all.find(_.name == "m_lstm_infer").get
        .run(spark, dir).count()
    }
    spark.stop()
  }
}
