package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: assign documents to fixed-capacity token
  * sequences, GPT-style — concatenate docs in a deterministic order and cut
  * every `capacity` tokens. The output says, for every doc, which sequence
  * it starts in (`seq_id`) and at which token offset (`seq_offset`).
  *
  * Scale shape: a single global concatenation order would serialize the
  * whole corpus through one window partition, so docs are first split into
  * `nShards` hash shards and packed independently per shard — each shard is
  * one window partition, so the work distributes across executors and the
  * only shuffle is the hash exchange on `shard`. At 100 TB pick
  * nShards ≈ a few × total cores; packing quality is unaffected (every
  * shard yields full sequences except its last).
  *
  * Deterministic by construction (no RNG): shard = id % nShards, order by id
  * within the shard.
  */
object Packing {

  /** @param docs     frame carrying `idCol` (integral) and `tokCol` (token
    *                 count per doc)
    * @param capacity tokens per packed sequence
    * @return input columns + shard, cum (running token count within shard),
    *         seq_id (global sequence index, INTERLEAVED: local·nShards +
    *         shard — collision-free for any per-shard sequence count, unlike
    *         a fixed-stride `shard·2^k + local` which wraps into the next
    *         shard's range once a shard packs more than 2^k sequences),
    *         seq_offset (token offset of this doc's first token within its
    *         sequence)
    */
  def pack(docs: DataFrame, idCol: String, tokCol: String,
      capacity: Int, nShards: Int = 32): DataFrame = {
    require(capacity > 0 && nShards > 0)
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(idCol).cast("long"), lit(nShards.toLong)))
      .withColumn("cum", sum(col(tokCol).cast("long")).over(w))
      .withColumn("local_seq",
        expr(s"(cum - `$tokCol`) div $capacity")) // integer floor-div, no FP
      .withColumn("seq_id", col("local_seq") * nShards + col("shard"))
      .withColumn("seq_offset", (col("cum") - col(tokCol)) % capacity)
      .drop("local_seq")
  }
}
