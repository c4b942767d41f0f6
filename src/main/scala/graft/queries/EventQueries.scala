package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time operators over the `events` table — the batch forms of the streaming
  * surface (SURVEY §2.8): tumbling windows, sessionization, and semi-structured
  * (JSON) extraction. The same expressions run under Structured Streaming with a
  * watermark on `ts` (see graft.streaming); here they are verified in batch against
  * the DuckDB oracle.
  *
  * Time arithmetic is integer µs (`ts div 1000` == DuckDB `epoch_us(ts)`), see
  * [[WindowQueries]] for why.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("tus", expr("ts div 1000"))

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1-hour window aggregation (streaming form:
    // groupBy(window($"ts", "1 hour"), $"event_type"))
    QueryDef(
      "e_tumbling_hourly",
      (s, dir) =>
        ev(s, dir)
          .withColumn("hour_s", expr("(tus div 3600000000) * 3600"))
          .groupBy("hour_s", "event_type")
          .agg(count(lit(1)).as("cnt"),
            Exact.dsum(col("value")).as("sum_value"))
          .orderBy("hour_s", "event_type"),
      Some(s"""SELECT (epoch_us(ts) // 3600000000) * 3600 AS hour_s, event_type,
              |  CAST(COUNT(*) AS BIGINT) AS cnt,
              |  ${Exact.sqlDsum("value")} AS sum_value
              |FROM events GROUP BY 1, 2 ORDER BY hour_s, event_type""".stripMargin)),

    // Sessionization with a 30-minute inactivity gap (streaming form: session_window /
    // flatMapGroupsWithState). Classic gaps-and-islands: lag → new-session flag →
    // running sum.
    QueryDef(
      "e_sessionize",
      (s, dir) => {
        val byUser = Window.partitionBy("user_id").orderBy("tus", "event_id")
        val run = Window.partitionBy("user_id").orderBy("tus", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .withColumn("new_sess",
            when(col("tus") - lag("tus", 1).over(byUser) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum("new_sess").over(run))
          .groupBy("user_id")
          .agg((max("sess_id") + 1).as("n_sessions"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id")
      },
      Some("""WITH flags AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS tus,
             |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1)
             |           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
             |         > 1800000000 THEN 1 ELSE 0 END AS new_sess
             |  FROM events),
             |sess AS (
             |  SELECT user_id,
             |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
             |                        ROWS UNBOUNDED PRECEDING) AS sess_id
             |  FROM flags)
             |SELECT user_id, CAST(MAX(sess_id) + 1 AS BIGINT) AS n_sessions,
             |       CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Sliding (hopping) 1-hour window every 30 min: each event lands in two
    // windows (streaming form: window($"ts", "1 hour", "30 minutes")).
    // Expressed relationally as an explode over the two covering window starts.
    QueryDef(
      "e_sliding_hourly",
      (s, dir) =>
        ev(s, dir)
          .withColumn("win_start", explode(array(
            expr("(tus div 1800000000) * 1800"),
            expr("(tus div 1800000000) * 1800 - 1800"))))
          .groupBy("win_start")
          .agg(count(lit(1)).as("cnt"), Exact.dsum(col("value")).as("sum_value"))
          .orderBy("win_start"),
      Some(s"""SELECT win_start, CAST(COUNT(*) AS BIGINT) AS cnt,
              |  ${Exact.sqlDsum("value")} AS sum_value
              |FROM (
              |  SELECT unnest([(epoch_us(ts) // 1800000000) * 1800,
              |                 (epoch_us(ts) // 1800000000) * 1800 - 1800]) AS win_start,
              |         value
              |  FROM events)
              |GROUP BY win_start ORDER BY win_start""".stripMargin)),

    // Semi-structured JSON extraction (props column) + aggregation.
    QueryDef(
      "e_json_extract",
      (s, dir) =>
        ev(s, dir)
          .withColumn("k_val", get_json_object(col("props"), "$.k").cast("bigint"))
          .groupBy("event_type")
          .agg(sum("k_val").as("sum_k"),
            count(lit(1)).as("cnt"),
            max("k_val").as("max_k"))
          .orderBy("event_type"),
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(COUNT(*) AS BIGINT) AS cnt,
             |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
  )
}
