package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  test("pack: offsets advance by token count and wrap at capacity boundaries") {
    import spark.implicits._
    // one shard (nShards=1) to make the sequence layout easy to reason about
    val docs = Seq((0L, 300L), (1L, 300L), (2L, 100L), (3L, 50L))
      .toDF("doc_id", "n_tok")
    val packed = Packing.pack(docs, "doc_id", "n_tok", capacity = 512, nShards = 1)
      .orderBy("doc_id")
      .select("seq_id", "seq_offset").as[(Long, Long)].collect()
    // cum: 300, 600, 700, 750 → starts at 0, 300, 600, 700
    assert(packed(0) === ((0L, 0L)))
    assert(packed(1) === ((0L, 300L))) // starts inside seq 0, spills into 1
    assert(packed(2) === ((1L, 88L))) // 600 - 512
    assert(packed(3) === ((1L, 188L)))
  }

  test("pack: shards are independent and seq_ids never collide across shards") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, 37L)).toDF("doc_id", "n_tok")
    val packed = Packing.pack(docs, "doc_id", "n_tok", capacity = 64, nShards = 4)
    // every doc lands in its id's shard
    assert(packed.filter(col("shard") =!= pmod(col("doc_id"), lit(4))).count() === 0)
    // global seq ids are unique per (shard, local index): no cross-shard reuse
    val perSeq = packed.groupBy("seq_id")
      .agg(countDistinct("shard").as("n_shards"))
    assert(perSeq.filter(col("n_shards") > 1).count() === 0)
    // conservation: every shard's token total equals the sum of its docs
    val totals = packed.groupBy("shard").agg(sum("n_tok").as("t")).collect()
    assert(totals.forall(_.getLong(1) === 50 * 37L))
  }
}
