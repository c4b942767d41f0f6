package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — the reference's scattered assertion cells and
  * fail-loud guards systematized (SURVEY §5: required-column KeyErrors,
  * NaN-free embeddings, physical range checks like speed ≤ 15 yd/s,
  * one-route-per-play cardinality).
  *
  * Each check either *reports* (one row per violated rule, computed in a
  * single aggregation pass over the data) or *enforces* (throws). At 100 TB
  * the report form is one scan; run it on the same pass as ingestion by
  * caching, or on a sample.
  */
object Checks {

  final case class Rule(name: String, predicate: Column)

  /** Required columns present, else IllegalArgumentException listing all
    * missing (reference: preprocess.py:288-293). Plan-time, free. */
  def requireColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** One-pass violation report: for each rule, how many rows FAIL the
    * predicate. Returns (rule, n_violations, n_rows) rows for violated rules.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.map(r =>
      sum(when(!coalesce(r.predicate, lit(false)), 1L).otherwise(0L)).as(r.name))
    val total = df.agg(count(lit(1)).as("__n"), aggs: _*).head()
    val n = total.getAs[Long]("__n")
    import df.sparkSession.implicits._
    rules.map(r => (r.name, total.getAs[Long](r.name), n))
      .filter(_._2 > 0)
      .toDF("rule", "n_violations", "n_rows")
  }

  /** Streaming ingest gate: enforce the rules on every micro-batch via
    * foreachBatch, pass clean batches to `sink`. A violating batch throws,
    * which FAILS the query (and, with a checkpoint, blocks re-processing
    * until fixed) — bad data stops at the door instead of poisoning the
    * corpus. */
  def enforceStream(stream: DataFrame, rules: Seq[Rule],
      checkpointLocation: String)(
      sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        sink(enforce(batch.toDF(), rules), batchId)
      }
      .start()

  /** Enforcing variant: throws with the violation summary if any rule fails. */
  def enforce(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val bad = report(df, rules).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException("data-quality violations: " +
        bad.map(r => s"${r.getString(0)}=${r.getLong(1)}/${r.getLong(2)}").mkString(", "))
    df
  }

  /** The reference's physical-range rules for tracking frames
    * (reference: BDB_2026.ipynb cells 23, 53, 77). */
  def trackingRules: Seq[Rule] = Seq(
    Rule("x_in_field", col("x").between(0.0, 120.0)),
    Rule("y_in_field", col("y").between(0.0, 53.3)),
    Rule("speed_physical", col("s") <= 15.0 && col("s") >= 0.0),
    Rule("dir_in_degrees", col("dir") >= 0.0 && col("dir") < 360.0),
    Rule("frame_positive", col("frame_id") >= 1),
    Rule("no_nan_coords", !isnan(col("x")) && !isnan(col("y"))))

  /** Cardinality check: exactly one targeted receiver per play
    * (reference: cell 53's one-route-per-play assert). Returns violating plays. */
  def oneTargetPerPlay(tracking: DataFrame): DataFrame =
    tracking.filter(col("player_role") === "Targeted Receiver")
      .groupBy("game_id", "play_id")
      .agg(countDistinct("nfl_id").as("n_targets"))
      .filter(col("n_targets") =!= 1)

  /** Population Stability Index between a baseline and a current frame over
    * fixed bins of `c`: PSI = Σ_bins (p_cur − p_base)·ln(p_cur / p_base).
    * The standard drift gate for a continuously-ingested training corpus
    * (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).
    *
    * Proportions are clamped at `eps` so an empty bin contributes a large
    * finite term instead of ±∞. Two aggregation passes (one per frame, each a
    * single scan with map-side combine) + a few-row join — at 100 TB the cost
    * is the two scans, nothing else. Returns one row:
    * (psi rounded to 6 dp, n_base, n_cur).
    */
  def psi(base: DataFrame, cur: DataFrame, c: String, edges: Seq[Double],
      eps: Double = 1e-6): DataFrame = {
    require(edges.nonEmpty && edges == edges.sorted, "edges must be ascending")
    def binned(df: DataFrame, n: String) = {
      val bin = edges.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col(c) >= e, 1).otherwise(0)
      }
      df.select(bin.as("bin")).groupBy("bin").agg(count(lit(1)).as(n))
    }
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    binned(base, "n_base")
      .join(binned(cur, "n_cur"), Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_base", "n_cur"))
      .withColumn("tb", sum("n_base").over(wAll))
      .withColumn("tc", sum("n_cur").over(wAll))
      .withColumn("pb", greatest(col("n_base") / col("tb"), lit(eps)))
      .withColumn("pc", greatest(col("n_cur") / col("tc"), lit(eps)))
      .agg(
        round(sum((col("pc") - col("pb")) * log(col("pc") / col("pb"))), 6)
          .as("psi"),
        max("tb").as("n_base"), max("tc").as("n_cur"))
  }
}
