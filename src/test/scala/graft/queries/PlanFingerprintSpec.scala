package graft.queries

import graft.SparkSpec
import graft.queries.PlanFingerprints.Fp

/** Plan-shape regression gate (round-6 VERDICT #6): one pinned fingerprint
  * (exchange / broadcast-join / sort-merge / nested-loop counts, post-AQE)
  * per headline query. A code or Catalyst change that silently
  * de-broadcasts a dimension, adds a shuffle, or degrades a join to a
  * nested loop fails HERE with a table diff — not in production at 100×
  * the data. After an INTENTIONAL plan change, regenerate with
  * `sbt "runMain graft.tools.PlanFingerprint /root/testdata/sf0.001"`,
  * review the diff, and paste.
  */
class PlanFingerprintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Pinned at sf0.001 (tools.PlanFingerprint output, reviewed round 7):
    * nested loops are the documented 1-row-scalar or bounded-broadcast
    * cross joins (PlanSweepSpec's allowlist); sort-merge joins are zero
    * everywhere at this scale. */
  private val pinned = Map(
    "j7_nearest_in_group" -> Fp(2, 1, 0, 0),
    // scale twin (r15): union -> ONE nk exchange feeding two growing-frame
    // window sorts + broadcast of the 25-row supplier counts; exchanges =
    // union repartition + window exchange + final sort
    "j7_nearest_asof" -> Fp(3, 1, 0, 0),
    "j_star_chain" -> Fp(4, 3, 0, 0),
    // round-13 MERGE pin: the fact-fact edge is the co-bucketed SORT-FREE
    // sort-merge join (PlanAuditSpec asserts no Sort/Exchange under it) —
    // without the pin, bench SFs broadcast the whole orders fact and the
    // query demonstrates nothing
    "j_star_chain_bucketed" -> Fp(2, 3, 1, 0),
    "q1_pricing_summary" -> Fp(2, 0, 0, 0),
    "a2_residual_stats" -> Fp(2, 0, 0, 0),
    "a_rollup" -> Fp(2, 0, 0, 0),
    "w10_ordered_collect" -> Fp(2, 0, 0, 0),
    "w_range_rolling" -> Fp(2, 0, 0, 0),
    "e_sessionize" -> Fp(2, 0, 0, 0),
    "e_interval_join" -> Fp(2, 1, 0, 0),
    "e_asof_join" -> Fp(3, 0, 0, 0),
    // round-12 small-graph fast path: the result is a driver-computed
    // LocalRelation; the one exchange is the query's ORDER BY over those
    // dozens of rows (reviewed — the iteration itself plans ZERO stages)
    "e_pagerank_types" -> Fp(1, 0, 0, 0),
    "t_fingerprint" -> Fp(1, 0, 0, 0),
    "t_pack" -> Fp(2, 0, 0, 0),
    // r19: per-execution pins were tried and REVERTED (driver dead time
    // exceeded the fixture-bounded subtree work — OPTIMIZATION_r19 #5)
    "d_contamination" -> Fp(5, 5, 0, 0),
    // round-13 rebuild: the pair table is pinned as a LocalRelation and lp
    // is an explicit broadcast — the scoring job is 1 Generate / 0 SMJ; the
    // 5 exchanges are the tiny ctx/vocab aggs + the per-doc agg + order
    // r18: vocab folded into the pin pass (sentinel bigrams) and ctx summed
    // on the driver — the singles-scan exchanges, the ctx broadcast join,
    // and the 1-row vocab cross join all left the plan
    "t_bigram_lm" -> Fp(2, 1, 0, 0),
    "t_chunk" -> Fp(1, 0, 0, 0),
    "t_bpe_train" -> Fp(1, 0, 0, 0),
    "d_simhash_banded" -> Fp(3, 0, 0, 0), // r19: min-band emission replaced distinct (OPTIMIZATION_r19 #2)
    "d_minhash_sig" -> Fp(2, 0, 0, 0),
    "d_minhash_lsh_pairs" -> Fp(3, 0, 0, 0), // r19: min-band emission (OPTIMIZATION_r19 #2)
    "d_fuzzy_verify" -> Fp(3, 2, 0, 0), // r19: lshPairs min-band emission (OPTIMIZATION_r19 #2)
    "s_knn_brute" -> Fp(2, 2, 0, 1),
    "s_lsh_knn_multiprobe" -> Fp(2, 1, 0, 0),
    "a_hll_mergeable" -> Fp(4, 0, 0, 1),
    "a_cms_topk" -> Fp(1, 0, 0, 0),
    // r15 re-pin 4 -> 2: repartitioning on game_id alone lets the
    // collect_list agg reuse the explicit exchange (the literal
    // play_id/nfl_id keys previously defeated EnsureRequirements and
    // doubled the sequence shuffle); remaining 2 = the sequence exchange
    // + the final scalar-agg exchange
    "m_lstm_infer" -> Fp(2, 0, 0, 0),
    // round-7 second wave: the bloom probe filter is narrow (no exchange of
    // its own — 2 = agg + order, 1 broadcast = the dim join); dup-spans is
    // gram-agg + doc window + order with the dup set and doc-stats joins
    // broadcast at this scale
    "j_bloom_join" -> Fp(2, 1, 0, 0),
    "d_dup_spans" -> Fp(4, 2, 0, 0),
    // round 8: the composed lake read — pruned-file scan feeds a broadcast
    // dim join (1); agg + order are the 2 exchanges. The bloom probe and the
    // file pruning are both exchange-free by design, so any new exchange
    // here means the composition broke.
    "l_pruned_bloom_join" -> Fp(2, 1, 0, 0),
    // t-digest rollup: daily sketch agg + merge agg + final order (3
    // exchanges); the 1-row exact-percentile frame rides a documented
    // broadcast nested-loop cross join (PlanSweepSpec allowlist shape).
    // The exact columns stay on the builtin percentile — events.value is a
    // bounded distinct domain (see the query's comment), so the map is
    // ~18k entries at any scale
    "a_tdigest_quantiles" -> Fp(3, 0, 0, 1),
  )

  test("every headline query matches its pinned post-AQE plan fingerprint") {
    // pin the broadcast thresholds other suites may have perturbed — the
    // fingerprints assume the GraftSession defaults
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "10485760"))
    try {
      val names = Registry.headline.map(_.name)
      val missing = names.filterNot(pinned.contains)
      assert(missing.isEmpty,
        s"headline queries without a pinned fingerprint: $missing — run " +
          "tools.PlanFingerprint and add them")
      val diffs = names.flatMap { n =>
        val actual = PlanFingerprints.of(
          Registry.all.find(_.name == n).get.run(spark, dir))
        if (actual == pinned(n)) None
        else Some(s"$n: pinned ${pinned(n)} actual $actual")
      }
      assert(diffs.isEmpty, "plan fingerprints drifted:\n" + diffs.mkString("\n"))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
