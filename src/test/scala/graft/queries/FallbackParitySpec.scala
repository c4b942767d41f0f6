package graft.queries

import graft.SparkSpec

/** Integration-scale parity pins for the two driver-local fast paths
  * (r18 VERDICT #10): the gated pins are spec-covered at unit scale, but the
  * FALLBACKS — what actually runs when data outgrows the gates at 100 TB —
  * must also be exercised through the FULL query over a real corpus tier,
  * not a synthetic fixture. Each test forces the fallback via its gate knob
  * and asserts row-for-row (bit-exact — both paths are documented
  * bit-identical, not tolerance-equal) agreement with the default path.
  *
  * Tier choice: t_bigram_lm runs at sf0.1 (the largest committed testdata
  * tier — hermetic; the sf1 dir is generated under /tmp and may not exist
  * on a fresh box). BPE trains at sf0.01: its forced-distributed loop is
  * ~40 driver-scheduled rounds and sf0.1 would dominate the whole suite's
  * wall on the 2-core test session for no extra path coverage.
  */
class FallbackParitySpec extends SparkSpec {

  test("t_bigram_lm: distributed fallback (pinnable=false) is row-identical " +
      "to the pinned path over the sf0.1 corpus") {
    val dir = "/root/testdata/sf0.1"
    val pinned = TextQueries.bigramLm(spark, dir)
    val fallback = TextQueries.bigramLm(spark, dir, maxPairs = 0)
    assert(fallback.exceptAll(pinned).isEmpty &&
      pinned.exceptAll(fallback).isEmpty,
      "pinned and distributed bigram-LM paths must agree bit-for-bit")
  }

  test("Bpe.train: distributed fallback (localMaxWords=0) learns the " +
      "identical merge sequence over the sf0.01 corpus") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val local = graft.operators.Bpe.train(docs, "text", 16)
    val dist = graft.operators.Bpe.train(docs, "text", 16, localMaxWords = 0)
    try assert(local.merges === dist.merges,
      "driver-local and distributed BPE must learn identical merges")
    finally {
      graft.Checkpoints.release(local.words)
      graft.Checkpoints.release(dist.words)
    }
  }
}
