package graft.operators

import graft.SparkSpec

class DupSpansSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int = 8) =
    DupSpans.coverage(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  // 12 shared tokens; the rest of each doc is unique filler
  private val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"

  test("a shared 12-token run covers 12 tokens in both docs (overlap merge)") {
    val out = run(Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight nine ten $shared eleven twelve"),
      (3L, "totally unrelated words that repeat nothing from the others at all")))
    // 5 overlapping 8-grams inside the shared run merge into ONE island of
    // 12 tokens — not 5 × 8 = 40
    assert(out(1L) === ((18L, 12L, 12.0 / 18)))
    assert(out(2L) === ((18L, 12L, 12.0 / 18)))
    assert(out(3L) === ((11L, 0L, 0.0)))
  }

  test("within-doc repetition alone does not count (cross-doc only)") {
    val rep = "red blue green yellow purple orange pink brown"
    val out = run(Seq(
      (1L, s"$rep and then once more $rep to finish"),
      (2L, "nothing shared with the first document appears anywhere here now")))
    assert(out(1L)._2 === 0L)
    assert(out(2L)._2 === 0L)
  }

  test("a gram in >=2 docs marks ALL its occurrences, including repeats") {
    val out = run(Seq(
      (1L, s"$shared filler0 fillerA and again $shared fillerB"),
      (2L, s"prefix tokens here $shared suffix tokens there")))
    // doc 1 carries the shared run twice: both islands count
    assert(out(1L)._2 === 24L)
    assert(out(2L)._2 === 12L)
  }

  test("disjoint shared runs stay separate islands; coverage sums") {
    val sharedB = "nu xi omicron pi rho sigma tau upsilon"
    val out = run(Seq(
      (1L, s"$shared gapword1 gapword2 gapword3 $sharedB"),
      (2L, s"$shared other words entirely here now $sharedB")))
    assert(out(1L)._2 === 20L) // 12 + 8, gap of 3 uncovered
    assert(out(1L)._1 === 23L)
  }

  test("short (<k) and empty docs survive with zero coverage") {
    val out = run(Seq(
      (1L, "too short"),
      (2L, ""),
      (3L, s"$shared padded out with extra unique words"),
      (4L, s"intro tokens first $shared then other unique words")))
    assert(out(1L) === ((2L, 0L, 0.0)))
    assert(out(2L) === ((0L, 0L, 0.0)))
    assert(out(3L)._2 === 12L)
  }

  test("whitespace runs and leading/trailing space tokenize cleanly") {
    val out = run(Seq(
      (1L, s"  $shared   tail1\ttail2  "),
      (2L, s"$shared head1 head2 head3 head4")))
    assert(out(1L)._1 === 14L)
    assert(out(1L)._2 === 12L)
  }
}
