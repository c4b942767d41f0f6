package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.Cross

/** Automated plan hygiene sweep over EVERY registry query: no accidental
  * cartesian products and no accidental single-partition windows. Queries
  * that legitimately use either are listed explicitly with the reason —
  * adding a new query with a stray cross join or global window fails here,
  * not in production.
  */
class PlanSweepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Bounded-subset pair generators and broadcast-size query sets: the cross
    * join is the documented algorithm, not an accident. */
  private val allowedCross = Set(
    "d_simhash_pairs", // all-pairs Hamming on the bounded (≤100 doc) subset
    "d_ngram_jaccard", // exact verifier, same bounded subset
    "s_knn_brute", // brute-force baseline: query set is broadcast-size
    "s_embedding_neardup", // all-pairs cosine on a bounded id range
    "t_drift_psi", // few-bin frame × 1-row totals (c, t in the oracle too)
    "a12_having_global", // scalar global agg × per-group rollup (1-row side)
    "t_tfidf", // per-term df frame × 1-row corpus doc count (idf input)
    "t_unigram_lm", // per-term counts × 1-row (total, vocab) stats frame
    "t_bigram_lm", // per-bigram counts × 1-row vocab-size stats frame
    "e_pagerank_types", // per-round 1-row dangling-mass scalar × node frame
                        // (localCheckpoint severs most rounds from the plan)
    "s_pq_knn", // ADC scan: broadcast-size query set × compressed code table
    "s_pq_knn_exact", // same ADC scan shape, uncapped shortlist (oracle twin)
    "a_hll_mergeable", // 1-row merged-sketch frame × 1-row direct/exact frame
    "a_tdigest_quantiles", // 1-row merged-digest frame × 1-row exact-percentile frame
    "a_theta_overlap", // 1-row sketch frames × each other × 1-row exact-count frame (self-audit)
    "s_ivfpq_knn", // bounded query×centroid probe pick; the CODE scan itself is an equi-join on cell (plan-asserted in IvfPqSpec)
    "d_semantic_ivfpq", // same bounded ×nLists-centroid probe pick; candidates reached by the cell equi-join (plan-asserted in ScalableDedupSpec)
    "d_semantic_ivfpq_exact", // exact-degradation oracle twin: same probe shape, all cells probed
    "d_semantic_subset_audit", // 1-row violations count × 1-row exact-pairs count (plus the bounded probe pick inside the capped run)
    "s_ivfpq_recall" // bounded query×centroid probe pick, as s_ivfpq_knn; recall join itself is an equi-join on (q_id, vec_id)
  )

  /** Global-threshold / global-rank semantics: the unpartitioned window IS
    * the operator, and its input is already aggregated/small. */
  private val allowedGlobalWindow = Set(
    "a12_having_global", // HAVING vs global max (per-player rollup input)
    "o1_sort_multikey", // global row_number over 100 suppliers
    "w7_rank", // global leaderboard rank (100 rows)
    "w8_percent_rank", // global percentile (spec'd as whole-population)
    "w6_minmax_scale", // global min-max scale (whole-population contract)
    "w5_zscore", // global z-score (same)
    "o2_topk", // global top-k rank before limit
    "t_drift_psi", // bin-proportion totals over a few-bin frame (Checks.psi)
    "t_vocab", // global rank over the AGGREGATED vocab table, not the corpus
    "t_oov", // same vocab rank feeding the broadcast membership join
    "e_rfm", // quartile ntile over the AGGREGATED per-user frame (|users| rows)
    "e_late_arrivals" // watermark = a single global frontier; the global
                      // running max IS the semantics (streaming is the scale
                      // path, this batch twin is the oracle)
  )

  private def logical(name: String): LogicalPlan =
    Registry.all.find(_.name == name).get.run(spark, dir)
      .queryExecution.optimizedPlan

  test("no query plans a cartesian product unless documented") {
    val offenders = Registry.all.map(_.name).filterNot(allowedCross).filter { n =>
      logical(n).collect { case j: Join if j.joinType == Cross => j }.nonEmpty
    }
    assert(offenders.isEmpty,
      s"undocumented cross joins in: ${offenders.mkString(", ")}")
  }

  test("no query plans an unpartitioned window unless documented") {
    import org.apache.spark.sql.catalyst.plans.logical.Window
    val offenders = Registry.all.map(_.name)
      .filterNot(allowedGlobalWindow).filter { n =>
        logical(n).collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }.nonEmpty
      }
    assert(offenders.isEmpty,
      s"undocumented global windows in: ${offenders.mkString(", ")}")
  }
}
