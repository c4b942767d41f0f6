package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle over the same parquet tables. The driver hash-compares
  * the two result sets (columns sorted by name), so implementations here are
  * engineered for EXACT equality, not approximate closeness — see [[Exact]].
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
    /** Scale-gate adjudication carried WITH the query (r17 verdict #8): a
      * query whose sf3→sf10 cpu exponent is super-linear BY CONTRACT —
      * its OUTPUT grows super-linearly under the replicated fixture, or it
      * deliberately pins a quadratic physical form as an oracle anchor —
      * declares that here, starting with `OUTPUT_BOUND:` followed by the
      * justification. [[graft.tools.PlanDiffScales]] copies the note into
      * SCALING_r&lt;N&gt;.json and `scripts/close_round.py` generates its
      * allowlist from those notes, so the code is the source of truth and
      * the gate prints every entry it honors — the list cannot grow
      * silently. Queries without a note are gated at exponent ≤ 1.3. */
    scaleNote: Option[String] = None)

/** Determinism helpers.
  *
  * Floating-point aggregation is order-dependent: Spark's partial/final agg tree and
  * DuckDB's sequential sum visit rows in different orders, so `sum(double)` differs in
  * the last ulps between engines. We make sums order-independent by rounding each value
  * to a fixed decimal scale (identical HALF_UP rounding on both engines — ties are
  * impossible because no binary double lands exactly on half of a 10^-s grid) and
  * summing exactly in decimal. Derived stats (avg, stddev, corr, rmse) are then pure
  * deterministic double arithmetic over exact sums, written with identical association
  * order in the Spark expression and the oracle SQL.
  *
  * The decimal→double cast itself has a precision cliff the sf1 sweep exposed (round
  * 6): once a sum carries more significant digits than a double holds (~16, e.g. a
  * 5e10 money sum at scale 6), the conversion must round — Java's
  * `BigDecimal.doubleValue` is correctly rounded (single-power-of-ten fast path or
  * `parseDouble`), but DuckDB casts int128→double and THEN divides by 10^scale, a
  * double rounding that can land 1 ulp away. The oracle side therefore bridges
  * through VARCHAR (`CAST(CAST(sum AS VARCHAR) AS DOUBLE)`): decimal→string is exact
  * and string→double is correctly rounded, so both engines produce the bit-identical
  * correctly-rounded double at ANY magnitude. Identity where no cliff exists.
  */
object Exact {
  val dt = DecimalType(38, 6)

  /** Order-independent exact sum of a double expression, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(dt)).cast("double")

  /** Exact-sum mean: CAST(SUM(DECIMAL)/1 AS DOUBLE) / COUNT. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Correctly-rounded decimal→double for DuckDB SQL (see class doc). */
  def sqlDec2Dbl(dec: String): String = s"CAST(CAST(($dec) AS VARCHAR) AS DOUBLE)"

  /** SQL mirror of [[dsum]]. */
  def sqlDsum(e: String): String = sqlDec2Dbl(s"SUM(CAST(($e) AS DECIMAL(38,6)))")

  /** SQL mirror of [[davg]]. */
  def sqlDavg(e: String): String = s"(${sqlDsum(e)} / COUNT($e))"

  private val dt12 = DecimalType(38, 12)

  /** Higher-resolution variant for unit-scale values (embeddings, cosines). */
  def dsum12(c: Column): Column = sum(c.cast(dt12)).cast("double")

  /** SQL mirror of [[dsum12]]. */
  def sqlDsum12(e: String): String = sqlDec2Dbl(s"SUM(CAST(($e) AS DECIMAL(38,12)))")
}
