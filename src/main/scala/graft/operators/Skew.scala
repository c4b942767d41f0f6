package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §4; "salting for skew" in the
  * north-star brief).
  *
  * AQE's skew-join split handles most sort-merge skew at runtime; salting is
  * the structural fix when one key dominates so heavily that even split
  * partitions bottleneck, or when the join is a shuffled hash join AQE won't
  * split. Mechanics: the big (skewed) side gets a random salt in [0, n); the
  * small side is replicated n× with every salt value; the join key becomes
  * (key, salt), spreading each hot key over n reducers.
  */
object Skew {

  /** Salted equi-join: `big ⋈ small` on `keys`, with `big`'s rows
    * scattered across `nSalts` sub-keys and `small` replicated to match.
    *
    * `joinType` is restricted to `inner` / `left`(`_outer`): for those the
    * row-count semantics are identical to the unsalted join. Right/full outer
    * would emit each unmatched `small` row once PER SALT (it was replicated
    * `nSalts` times), silently multiplying the outer side — so they are
    * rejected rather than quietly wrong.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(nSalts > 0)
    require(Set("inner", "left", "left_outer", "leftouter")
        .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left_outer only (got '$joinType'): " +
        "outer-preserving the replicated small side would duplicate its " +
        s"unmatched rows $nSalts times")
    // rand() is fine here: the salt only routes rows, it never changes results
    val salted = big.withColumn("__salt", (rand(42) * nSalts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Top-k hot keys by frequency — the diagnostic used to decide whether a
    * join needs salting (run on a sample at scale). */
  def hotKeys(df: DataFrame, keys: Seq[String], topK: Int = 10): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc)
      .limit(topK)
}
