package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixtures.
  *
  * A training corpus is usually a weighted blend of sources ("90% of src0,
  * 30% of src2, ..."). Doing that with `rand()` makes every run a different
  * dataset and makes the sample non-reproducible across retries/backfills.
  * Instead each row's fate is a pure function of its id: a multiplicative
  * integer hash of the id, reduced to [0, 1000), compared against the
  * source's per-mille rate. Map-side only — no shuffle, no RNG state, stable
  * under re-partitioning, retries, and incremental appends (a doc's
  * keep/drop never changes when other docs arrive).
  *
  * The hash is Knuth's multiplicative constant 2654435761 (⌊2^32/φ⌋) with a
  * prime modulus to break the id's low-bit regularity; per-mille resolution
  * keeps everything in exact integer arithmetic (cross-engine reproducible —
  * no float thresholds).
  */
object Sampling {

  /** Pseudo-uniform value in [0, 1000) derived from the id. The modulus
    * 99991 is prime and coprime to the Knuth constant (2654435761 mod 99991
    * = 74675), so the multiply is a bijection on the residues — no two
    * residue classes share keep/drop fates. The id is reduced mod the prime
    * BEFORE the multiply — ((id mod m)·C) mod m equals (id·C) mod m exactly,
    * but the direct form overflows int64 (and under ANSI mode THROWS) once
    * id exceeds ~3.4·10⁹, a corpus size 100 TB reaches. */
  def perMille(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(99991L)) * 2654435761L, lit(99991L)) % 1000L

  /** SQL text of [[perMille]] (for oracle parity). */
  def perMilleSql(idExpr: String): String =
    s"(((($idExpr) % 99991) * 2654435761) % 99991) % 1000"

  /** Keep each row whose source's per-mille rate exceeds its hash draw.
    * `rates` maps source → rate in [0, 1000]; sources absent from the map
    * get `defaultRate`.
    */
  def mixture(df: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Int], defaultRate: Int = 0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1000),
      "rates are per-mille: 0..1000")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (src, r)) =>
      when(col(sourceCol) === src, lit(r)).otherwise(acc)
    }
    df.filter(perMille(col(idCol)) < rate)
  }

  /** Stratified FIXED-SIZE sample: exactly `k` rows per stratum (fewer if the
    * stratum is smaller), chosen by the deterministic hash order with the id
    * as tiebreak — balanced eval subsets that never change across runs.
    * One exchange on the stratum key; the per-stratum window state is the
    * stratum size. When k ≪ stratum at 100 TB, swap the window for the
    * bounded-state [[TopK]] aggregator (O(k) per mapper, partial-agg
    * friendly) — same ordering contract, same output.
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(perMille(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
