package graft.tools

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evidence generator for the r18 PageRank collapse fix (r18 VERDICT #3 /
  * r19 item #8): the committed `plans/r18/e_pagerank_types_before.txt` was
  * the post-collapse OUTPUT plan and did not show the claimed 1-partition
  * exchange, so this reproduces both plan shapes side by side:
  *
  *  - PRE-FIX: the e_pagerank_types edge pipeline re-rooted (via global
  *    temp view, exactly the old code's channel) into an isolated session
  *    whose `spark.sql.shuffle.partitions` is scoped to the collapsed
  *    frame's size (1) — the collapse's window + aggregate plan shows
  *    `Exchange hashpartitioning(user_id, 1)`: the whole O(|E|) upstream
  *    pass as a single task.
  *  - POST-FIX: the same collapse planned on the caller session — the
  *    exchange carries the caller's data-derived partition count.
  *
  * Output goes to stdout; commit it as plans/r19/pagerank_collapse_repro.txt.
  * PageRankSpec's "collapse runs at the CALLER's parallelism" test is the
  * executable regression guard; this artifact is the plan-level evidence.
  */
object PageRankCollapseRepro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.builder(8, dir).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the e_pagerank_types edge derivation (same construction as the query)
    def edges(s: org.apache.spark.sql.SparkSession) = {
      val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      Tables.eventsUs(s, dir)
        .select(col("user_id"), col("tus"), col("event_id"), col("event_type"))
        .withColumn("src", lag("event_type", 1).over(w))
        .filter(col("src").isNotNull)
        .select(col("src"), col("event_type").as("dst"))
    }
    def collapse(e: org.apache.spark.sql.DataFrame) =
      e.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))

    println("========== PRE-FIX shape: collapse planned inside the " +
      "iteration scope (shuffle.partitions scoped to the collapsed frame " +
      "= 1) ==========")
    val iso = spark.newSession()
    iso.conf.set("spark.sql.shuffle.partitions", "1")
    edges(spark).createOrReplaceGlobalTempView("graft_prr_edges")
    collapse(iso.table("global_temp.graft_prr_edges")).explain("formatted")
    spark.catalog.dropGlobalTempView("graft_prr_edges")

    println("\n========== POST-FIX shape: collapse planned on the CALLER " +
      "session (data-derived shuffle partitions) ==========")
    collapse(edges(spark)).explain("formatted")
    spark.stop()
  }
}
