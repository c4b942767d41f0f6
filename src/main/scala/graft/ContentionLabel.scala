package graft

/** Pure contention-labeling logic for [[Bench]] — every detector in one
  * side-effect-free object so a spec can replay a recorded run's shape
  * (probe sequence, per-run walls, previous committed mins) and assert the
  * verdict, without running a bench.
  *
  * Why this exists (r16 post-mortem): the bench's only whole-run label used
  * to be "any single probe above max(0.75, 2.5 × the run's own median
  * probe)". That envelope is SELF-REFERENTIAL — uniform sustained
  * contention inflates the median probe and with it the envelope, so a run
  * where every number is load-poisoned (r16 driver re-run: total 33 s vs 16
  * idle, one query 46× its committed wall, another's per-run cpu escalating
  * 80→364→1716 s) can self-report `contended:false`. No single detector is
  * reliable against both spiky and uniform load, so the verdict is the OR
  * of independent signals, each catching what the others miss:
  *
  *  - '''per-window probe vs envelope''' (the r16 mechanism, kept): catches
  *    SPIKY load — a probe window that is slow relative to the run's own
  *    median. Blind to uniform load by construction.
  *  - '''run spread''' (generalizes `sf1_unstable` to every tier): a
  *    query's 3 timed walls spanning > [[SpreadRatio]]× (above an absolute
  *    floor) mean something other than the plan dominated at least one run.
  *    Catches escalating/bursty load that happens to miss probe windows.
  *  - '''calibration non-stationarity''': the probe series' thirds-medians
  *    spanning > [[DriftRatio]]× mean the box speed CHANGED during the run
  *    (the r16 poisoned sequence 0.359 → ~0.5 → 0.268 is exactly this
  *    shape). A stationary-but-slow box does not trip it.
  *  - '''absolute fence vs the previous committed line''': any query's
  *    min-of-3 above [[FenceRatio]]× its committed min (same SF, above a
  *    floor) flags REGARDLESS of probes — the one detector no amount of
  *    envelope inflation can silence, because its reference point is not
  *    from this run. A genuine >5× code regression also trips it; that is
  *    the honest label (bench_diff then adjudicates plan/code vs noise).
  *  - '''sustained ceiling''': median probe above [[SustainedCalCeiling]]
  *    is uniform whole-run load on every VM class observed so far (idle
  *    medians 0.24–0.47 across rounds 6–16); a genuinely slower future VM
  *    class must re-pin this constant — that is the documented trade the
  *    r16 advisory asked for, after the pure box-relative envelope proved
  *    it can hide exactly this case.
  *  - '''host steal''' (see [[StealCeiling]]): the hypervisor's own
  *    counter for cycles taken from this guest — the direct observable for
  *    the r16 executor-cpu ×26–50 anomaly, which no in-guest probe can
  *    reproduce or fully detect.
  *
  * Any signal firing ⇒ `contended:true`. The per-signal fields ride the
  * emitted line so an adjudicator sees WHICH detector fired and why.
  */
object ContentionLabel {

  /** ABSOLUTE floor (seconds) of the single-shot-probe envelope. Idle
    * single-shot probes: 0.24–0.37 s median (reference VM, rounds 6–8) with
    * spikes to ~2.2× median after warmup GC; 0.75 clears that spread. */
  val CalIdleEnvelope = 0.75

  /** Box-relative envelope factor over the run's own median probe: the r16
    * VM class idles at median ~0.44 (same 2.2× spike ratio), where the
    * absolute floor alone mislabels an idle-but-slower box. */
  val EnvelopeMedianFactor = 2.5

  /** Median-probe ceiling above which the WHOLE run is labeled contended
    * regardless of the relative envelope. Idle medians observed 0.24–0.47
    * across two VM classes; sustained contention multiplies the median by
    * ≥1.5×. A slower VM class that legitimately idles above this must
    * re-pin the constant (and the history comment). */
  val SustainedCalCeiling = 0.70

  /** Thirds-medians max/min ratio above which the probe series is
    * non-stationary (box speed changed mid-run). */
  val DriftRatio = 1.5

  /** Per-query wall spread (max/min over the timed runs) above which the
    * window is unstable, with [[SpreadFloorSec]] as the absolute-difference
    * floor so toy-cost queries don't flag on scheduler jitter. */
  val SpreadRatio = 3.0
  val SpreadFloorSec = 1.0

  /** Fence vs the previous committed min-of-3: ratio + absolute floor. */
  val FenceRatio = 5.0
  val FenceFloorSec = 1.0

  /** Steal fraction (Δsteal / Δtotal from /proc/stat across the run) above
    * which the run is contended at the HOST level. The r17 root-cause of
    * the r16 driver anomaly (executor cpu ×26–50, escalating run-over-run):
    * an in-guest antagonist (24 spinners, load 22) does NOT inflate
    * executorCpuTime at all (measured: sf1 m_lstm 17.9 cpu_s/run under
    * load vs 16.95 committed idle — threads wait, they don't burn), so the
    * only mechanism left that inflates guest THREAD cpu clocks is host
    * vCPU steal charged into the running thread's timeslice. Steal is also
    * the one counter in-guest probes cannot fake or miss: it comes from
    * the hypervisor. Box lifetime average here ~1.2%; 3% sustained across
    * a run means a noisy host — numbers are poisoned. */
  val StealCeiling = 0.03

  /** (steal, total) jiffies from the aggregate cpu line of /proc/stat;
    * None off-Linux or when unreadable. Diff two samples and divide to get
    * the run's steal fraction. */
  def procStatSteal(): Option[(Long, Long)] =
    try {
      val line = {
        val src = scala.io.Source.fromFile("/proc/stat")
        try src.getLines().next() finally src.close()
      }
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      // total = first 8 fields only (user..steal): guest/guest_nice are
      // already counted inside user/nice, so including them double-counts
      // guest time and understates the steal fraction (r17 ADVICE)
      if (f.length < 8) None else Some((f(7), f.take(8).sum))
    } catch { case scala.util.control.NonFatal(_) => None }

  final case class Verdict(
      medianCal: Double,
      envelope: Double,
      /** probe preceding the query's window exceeded the envelope */
      flagged: Seq[(String, Double)],
      /** per-run walls spanning > SpreadRatio× (any tier) */
      unstable: Seq[(String, Seq[Double])],
      /** thirds-medians of the probe series, when their span > DriftRatio */
      calDrift: Option[Seq[Double]],
      /** (query, current min, committed min) above the fence */
      fence: Seq[(String, Double, Double)],
      /** median probe when above SustainedCalCeiling */
      sustainedCal: Option[Double],
      /** host steal fraction when above StealCeiling */
      steal: Option[Double],
      contended: Boolean)

  def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0 else s(s.size / 2 min (s.size - 1))
  }

  def envelope(medianCal: Double): Double =
    math.max(CalIdleEnvelope, EnvelopeMedianFactor * medianCal)

  /** Thirds-medians of the probe series in RUN ORDER; Some(thirds) when
    * their max/min exceeds [[DriftRatio]] (needs ≥ 6 probes to mean
    * anything — below that a third is 1–2 samples of a spiky statistic). */
  def driftThirds(probesInOrder: Seq[Double]): Option[Seq[Double]] = {
    if (probesInOrder.size < 6) return None
    val n = probesInOrder.size
    val thirds = Seq(
      probesInOrder.slice(0, n / 3),
      probesInOrder.slice(n / 3, 2 * n / 3),
      probesInOrder.slice(2 * n / 3, n)).map(medianOf)
    val lo = thirds.min
    if (lo > 0 && thirds.max / lo > DriftRatio) Some(thirds) else None
  }

  /** The full verdict.
    *
    * @param probesInOrder per-query calibration probes in run order (name →
    *   probe seconds); sf1 probes ride with their `sf1:` prefix
    * @param edgeProbes the first/ann/apply/last calibration medians
    * @param wallRuns every tier's per-run wall times (unsorted ok)
    * @param currentMins min-of-3 per query for the fence comparison
    * @param committedMins the PREVIOUS committed line's min-of-3 per query
    *   (empty when no previous line exists or its SF differs — fence off)
    * @param stealFrac host steal fraction over the run (Δsteal/Δtotal from
    *   [[procStatSteal]]); None when unavailable
    */
  def label(
      probesInOrder: Seq[(String, Double)],
      edgeProbes: Seq[Double],
      wallRuns: Seq[(String, Seq[Double])],
      currentMins: Seq[(String, Double)],
      committedMins: Map[String, Double],
      stealFrac: Option[Double] = None): Verdict = {
    val medianCal = medianOf(probesInOrder.map(_._2))
    val env = envelope(medianCal)
    val flagged = probesInOrder.filter(_._2 > env)
    val unstable = wallRuns.filter { case (_, ts) =>
      ts.size >= 2 && ts.min > 0 &&
        ts.max > SpreadRatio * ts.min && ts.max - ts.min > SpreadFloorSec
    }
    val drift = driftThirds(probesInOrder.map(_._2))
    val fence = currentMins.flatMap { case (name, cur) =>
      committedMins.get(name).collect {
        case prev if prev > 0 && cur > FenceRatio * prev &&
            cur - prev > FenceFloorSec => (name, cur, prev)
      }
    }
    val sustained = if (medianCal > SustainedCalCeiling) Some(medianCal) else None
    val steal = stealFrac.filter(_ > StealCeiling)
    val contended = flagged.nonEmpty || unstable.nonEmpty || drift.nonEmpty ||
      fence.nonEmpty || sustained.nonEmpty || steal.nonEmpty ||
      edgeProbes.exists(_ > env)
    Verdict(medianCal, env, flagged, unstable, drift, fence, sustained,
      steal, contended)
  }
}
