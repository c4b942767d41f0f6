package graft

import org.scalatest.funsuite.AnyFunSuite

/** Replays recorded bench-run SHAPES through [[ContentionLabel]] — the pure
  * verdict logic — so the r16 failure mode (a load-poisoned run self-labeling
  * `contended:false` because the envelope was derived from the contaminated
  * sample) is pinned as a regression test, alongside the clean shapes that
  * must NOT flag (idle reference VM, idle-but-slower VM class).
  */
class ContentionLabelSpec extends AnyFunSuite {

  private def probes(pairs: (String, Double)*): Seq[(String, Double)] = pairs

  /** The r16 DRIVER re-run's shape, reconstructed from VERDICT_r16: probe
    * series starting 0.359, inflating mid-run, ending 0.268 (median 0.467 —
    * so the self-referential envelope reached 1.167 and flagged NOTHING);
    * t_chunk min 10.2 s vs committed 0.258; m_lstm sf1 per-run walls
    * escalating. Every detector that should fire, fires. */
  private val poisonedProbes: Seq[(String, Double)] = {
    val rampUp = (1 to 12).map(i => s"q$i" -> (0.34 + i * 0.012)) // 0.35–0.48
    val high   = (13 to 24).map(i => s"q$i" -> (0.50 + (i % 5) * 0.03)) // 0.50–0.62
    val decay  = (25 to 36).map(i => s"q$i" -> (0.26 + (i % 4) * 0.01)) // 0.26–0.29
    rampUp ++ high ++ decay
  }

  test("r16 driver poisoned shape self-labels contended (was: false)") {
    val v = ContentionLabel.label(
      probesInOrder = poisonedProbes,
      edgeProbes = Seq(0.359, 0.461, 0.455, 0.268),
      wallRuns = Seq(
        "t_chunk" -> Seq(10.2, 14.8, 12.1),
        "sf1:m_lstm_infer" -> Seq(4.9, 19.3, 61.0)),
      currentMins = Seq("t_chunk" -> 10.2, "sf1:m_lstm_infer" -> 4.9),
      committedMins = Map("t_chunk" -> 0.258, "sf1:m_lstm_infer" -> 1.19))
    assert(v.contended, "whole-run verdict must be contended")
    // the old mechanism alone still fails open — documented, not fixed away:
    assert(v.flagged.isEmpty,
      "envelope flags nothing (the r16 blind spot); the OTHER detectors carry")
    assert(v.calDrift.nonEmpty, "probe series is non-stationary")
    assert(v.unstable.exists(_._1 == "sf1:m_lstm_infer"),
      "escalating per-run walls are unstable")
    assert(v.fence.exists(_._1 == "t_chunk"),
      "t_chunk 10.2 vs committed 0.258 trips the absolute fence")
    // m_lstm's min wall (4.9 vs committed 1.19) sits UNDER the 5x fence —
    // its poisoning shows as run-over-run escalation, which is exactly what
    // the spread detector (not the fence) is for
    assert(!v.fence.exists(_._1 == "sf1:m_lstm_infer"))
  }

  test("uniform sustained contention trips the ceiling even when the relative envelope is silent") {
    // every probe ~2.2× the idle 0.44 median — uniform, stationary, spread-
    // free: only the absolute ceiling can catch it
    val uniform = (1 to 30).map(i => s"q$i" -> (0.95 + (i % 3) * 0.02))
    val v = ContentionLabel.label(uniform, Seq(0.96, 0.97, 0.95, 0.96),
      wallRuns = Seq("q1" -> Seq(2.0, 2.1, 2.2)),
      currentMins = Seq("q1" -> 2.0), committedMins = Map.empty)
    assert(v.flagged.isEmpty && v.calDrift.isEmpty && v.unstable.isEmpty)
    assert(v.sustainedCal.nonEmpty && v.contended)
  }

  test("idle reference VM stays clean") {
    val idle = (1 to 36).map(i => s"q$i" -> (0.24 + (i % 7) * 0.02)) // 0.24–0.36
    val v = ContentionLabel.label(idle, Seq(0.28, 0.30, 0.27, 0.26),
      wallRuns = Seq("a" -> Seq(0.9, 1.0, 1.1), "sf1:b" -> Seq(3.0, 3.2, 3.4)),
      currentMins = Seq("a" -> 0.9, "sf1:b" -> 3.0),
      committedMins = Map("a" -> 0.85, "sf1:b" -> 3.1))
    assert(!v.contended)
    assert(v.flagged.isEmpty && v.unstable.isEmpty && v.calDrift.isEmpty &&
      v.fence.isEmpty && v.sustainedCal.isEmpty)
  }

  test("idle-but-slower VM class (r16 box, median ~0.44) stays clean") {
    val idle = (1 to 36).map(i => s"q$i" -> (0.40 + (i % 5) * 0.02)) // 0.40–0.48
    // one isolated 2.2× spike (post-GC, the documented idle behavior) heals
    // via retry in Bench; here it flags its window but the single-window
    // spike is what the retry pass exists for — the verdict must still come
    // from real signals, so with no spike the run is fully clean
    val v = ContentionLabel.label(idle, Seq(0.44, 0.45, 0.42, 0.43),
      wallRuns = Seq("a" -> Seq(1.0, 1.1, 1.2)),
      currentMins = Seq("a" -> 1.0), committedMins = Map("a" -> 1.05))
    assert(!v.contended)
    assert(v.sustainedCal.isEmpty, "0.44 median is idle for this VM class")
  }

  test("genuine 2x regression does not trip the fence; 6x does") {
    val idle = (1 to 12).map(i => s"q$i" -> 0.30)
    val v2 = ContentionLabel.label(idle, Nil,
      wallRuns = Seq("a" -> Seq(2.0, 2.0, 2.1)),
      currentMins = Seq("a" -> 2.0), committedMins = Map("a" -> 1.0))
    assert(v2.fence.isEmpty && !v2.contended)
    val v6 = ContentionLabel.label(idle, Nil,
      wallRuns = Seq("a" -> Seq(6.0, 6.1, 6.0)),
      currentMins = Seq("a" -> 6.0), committedMins = Map("a" -> 1.0))
    assert(v6.fence == Seq(("a", 6.0, 1.0)) && v6.contended)
  }

  test("fence floor: a 0.01→0.06 toy query does not flag") {
    val idle = (1 to 12).map(i => s"q$i" -> 0.30)
    val v = ContentionLabel.label(idle, Nil,
      wallRuns = Seq("a" -> Seq(0.06, 0.06, 0.07)),
      currentMins = Seq("a" -> 0.06), committedMins = Map("a" -> 0.01))
    assert(v.fence.isEmpty && !v.contended)
  }

  test("spread floor: sub-second jitter on a toy query does not flag") {
    val idle = (1 to 12).map(i => s"q$i" -> 0.30)
    val v = ContentionLabel.label(idle, Nil,
      wallRuns = Seq("a" -> Seq(0.05, 0.12, 0.21)), // 4x ratio, 0.16 s span
      currentMins = Seq("a" -> 0.05), committedMins = Map.empty)
    assert(v.unstable.isEmpty && !v.contended)
  }

  test("host steal above the ceiling forces contended; below stays clean") {
    val idle = (1 to 12).map(i => s"q$i" -> 0.30)
    val hot = ContentionLabel.label(idle, Nil, Nil, Nil, Map.empty,
      stealFrac = Some(0.25))
    assert(hot.steal.contains(0.25) && hot.contended)
    val cool = ContentionLabel.label(idle, Nil, Nil, Nil, Map.empty,
      stealFrac = Some(0.012)) // the box's lifetime average
    assert(cool.steal.isEmpty && !cool.contended)
  }

  test("procStatSteal parses the aggregate cpu line on Linux") {
    if (new java.io.File("/proc/stat").exists()) {
      val s = ContentionLabel.procStatSteal()
      assert(s.nonEmpty)
      val (steal, total) = s.get
      assert(steal >= 0 && total > steal)
    }
  }

  test("driftThirds needs >= 6 probes") {
    assert(ContentionLabel.driftThirds(Seq(0.2, 0.9, 0.2, 0.9, 0.2)).isEmpty)
  }
}
