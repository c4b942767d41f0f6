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
    // the SAME pipeline the query runs — shared builder, no drifted copy
    val model = graft.ml.KerasLstm.load(graft.queries.ModelQueries.modelPath)
    def stages = graft.queries.ModelQueries.inferInput(spark, dir, model.nFeatures)
    def wide = stages._1
    def seqs = stages._2

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
      graft.ml.KerasLstm.scoreFlat(seqs, model,
        Seq("game_id", "play_id", "nfl_id")).count()
    }
    timed("+ final agg (full query)") {
      graft.queries.Registry.all.find(_.name == "m_lstm_infer").get
        .run(spark, dir).count()
    }
    spark.stop()
  }
}
