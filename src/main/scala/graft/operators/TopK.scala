package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k as a typed `Aggregator` (SURVEY §2.9's custom-aggregate
  * path), registered as an untyped UDAF so plain `groupBy.agg` can use it.
  *
  * vs `row_number().over(Window...)`: the window form shuffles ALL rows and
  * sorts each partition (O(n log n) per group, full materialization). This
  * aggregator keeps O(k) state, is O(n log k), and — because Aggregators get
  * map-side partial aggregation — the shuffle carries at most k entries per
  * group per mapper instead of the whole group. At 100 TB that's the
  * difference between shuffling the corpus and shuffling the leaderboard.
  * Use the window form when you need ranks of all rows; use this for top-k.
  */
object TopK {

  /** Bounded buffer: parallel arrays sorted by (-score, payload). */
  final case class TopBuf(scores: Seq[Double], payloads: Seq[String])

  private def merge2(a: TopBuf, b: TopBuf, k: Int): TopBuf = {
    val merged = (a.scores.zip(a.payloads) ++ b.scores.zip(b.payloads))
      .sortBy { case (s, p) => (-s, p) }
      .take(k)
    TopBuf(merged.map(_._1), merged.map(_._2))
  }

  def aggregator(k: Int): Aggregator[(Double, String), TopBuf, TopBuf] =
    new Aggregator[(Double, String), TopBuf, TopBuf] {
      override def zero: TopBuf = TopBuf(Nil, Nil)
      override def reduce(b: TopBuf, a: (Double, String)): TopBuf =
        merge2(b, TopBuf(Seq(a._1), Seq(a._2)), k)
      override def merge(b1: TopBuf, b2: TopBuf): TopBuf = merge2(b1, b2, k)
      override def finish(r: TopBuf): TopBuf = r
      override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
      override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    }

  /** Untyped UDAF handle: `df.groupBy(...).agg(TopK.udaf(5)(col("score"), col("id")))`. */
  def udafFn(k: Int) = udaf(aggregator(k),
    Encoders.tuple(Encoders.scalaDouble, Encoders.STRING))

  /** Top-k rows per group by `scoreCol` (desc, payload tiebreak); returns
    * (group..., rank, score, payload). */
  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
      payloadCol: String, k: Int): DataFrame = {
    val top = udafFn(k)(col(scoreCol).cast("double"),
      col(payloadCol).cast("string")).as("top")
    df.groupBy(groupCols.map(col): _*)
      .agg(top)
      .select((groupCols.map(col) :+
        posexplode(expr("arrays_zip(top.scores, top.payloads)"))
          .as(Seq("rank0", "e"))): _*)
      .select((groupCols.map(col) :+ (col("rank0") + 1).as("rank") :+
        col("e.scores").as("score") :+ col("e.payloads").as(payloadCol)): _*)
  }
}
