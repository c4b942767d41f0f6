package graft.queries

import graft.SparkSpec

/** The bigram-LM pin is double-gated (rows AND estimated driver bytes, both
  * priced by a one-row stats probe before any driver transfer). These tests
  * pin the gate semantics: every gated regime produces identical scores, and
  * the byte gate fires independently of the row gate.
  */
class BigramLmGateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("void-premise fallback (either gate) scores identically to the pin") {
    val pinned = TextQueries.bigramLm(spark, dir).collect().toSeq
    assert(pinned.nonEmpty)
    // row gate fires: stats-driven shuffle plan, full-explode vocabulary
    val rowGated = TextQueries.bigramLm(spark, dir, maxPairs = 0L)
    assert(rowGated.collect().toSeq === pinned,
      "row-gated fallback diverged from the pinned plan")
    // byte gate fires alone: rows fit but the estimated pin footprint won't
    val byteGated = TextQueries.bigramLm(spark, dir, maxPinBytes = 0L)
    assert(byteGated.collect().toSeq === pinned,
      "byte-gated fallback diverged from the pinned plan")
  }

  test("fallback plan contains no LocalRelation pin; pinned plan does") {
    // the pin is the only 4-column LocalRelation in the plan (the dataset's
    // tuple names sit under the a/b/cab/ca renaming Project; ctx is summed
    // on the driver, so the pinned plan carries no corpus subtree at all
    // below the broadcast)
    def hasLocalPin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.catalyst.plans.logical.LocalRelation
            if lr.output.size == 4 => lr
      }.nonEmpty
    assert(hasLocalPin(TextQueries.bigramLm(spark, dir)))
    assert(!hasLocalPin(TextQueries.bigramLm(spark, dir, maxPinBytes = 0L)))
  }
}
