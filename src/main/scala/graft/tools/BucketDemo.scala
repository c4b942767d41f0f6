package graft.tools

import graft.GraftSession
import graft.queries.Exact
import graft.sources.{Lake, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: quantifies what bucketing buys the star-chain join — the same
  * lineitem ⋈ orders ⋈ dims aggregation run (a) from plain parquet (both
  * fact sides exchange on orderkey) and (b) from tables bucketed on the join
  * key at write time (ZERO exchange on either fact side; the join is a local
  * per-bucket merge). At 100 TB variant (b) is the difference between moving
  * the fact table over the network per query and never moving it at all —
  * the write-once bucketing cost is amortized across every downstream
  * join/agg on that key.
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Simulate fact-scale sides: at 100 TB neither fact broadcasts, so turn
    // AUTO-broadcast off for the fact join (the explicit broadcast() hints on
    // the dims are still honored — that part survives any scale).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    def star(lineitem: DataFrame, orders: DataFrame): DataFrame =
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_items"),
          Exact.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))

    def timed(name: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[bucket] $name%-34s median ${runs(1)}%.3f s")
    }

    def exchanges(df: DataFrame): Int = {
      df.count()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectWithSubqueries {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }.size
    }

    // (a) plain parquet
    val plain = star(Tables.lineitem(spark, dir), Tables.orders(spark, dir))
    timed("plain parquet (shuffle join)") { plain.count() }
    println(s"[bucket] plain hash exchanges: ${exchanges(plain)}")

    // (b) bucketed tables, written once (idempotent: drop table + location)
    Seq("li_b", "or_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Lake.writeBucketed(Tables.lineitem(spark, dir), "li_b",
      Seq("l_orderkey"), 32, sortCols = Seq("l_orderkey"))
    Lake.writeBucketed(Tables.orders(spark, dir), "or_b",
      Seq("o_orderkey"), 32, sortCols = Seq("o_orderkey"))
    val bucketed = star(Lake.read(spark, "li_b"), Lake.read(spark, "or_b"))
    timed("bucketed tables (local merge)") { bucketed.count() }
    println(s"[bucket] bucketed hash exchanges: ${exchanges(bucketed)}")
    spark.stop()
  }
}
