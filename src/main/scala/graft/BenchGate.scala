package graft

/** The bench's hot-box adjudication arithmetic, extracted pure so the
  * criterion itself is unit-testable (round-19 verdict #1: BENCH_r19
  * shipped a 2.13× contended run stamped `box_hot:false` because the
  * retry criterion read only the CPU probes while the same artifact's
  * probe_mem spread read 555× — the data-path probes were recorded but
  * never gated).
  *
  * Model: each interleaved pass records one reading of every noise
  * probe (probe1 single-thread CPU, probe32 parallel CPU, probe_io
  * fixture read+fold, probe_mem 128 MB alloc+touch). A pass is QUIET
  * when every probe reading sits under its ceiling; ceilings are
  * spread-based against the run's own floor (a box has no absolute
  * CPU/io speed contract) with two safety rails:
  *
  *   - floors ([[MemFloorSec]], [[IoFloorSec]]) keep a near-zero
  *     denominator from turning measurement jitter into a fake spread
  *     (page-cached io reads single-digit ms — 3 ms vs 9 ms is noise,
  *     not contention);
  *   - the memory probe also carries an ABSOLUTE ceiling
  *     ([[MemAbsCeilingSec]]): a spread-only criterion is blind to a
  *     run whose every pass is uniformly mem-starved (spread ≈ 1 at
  *     9 s apiece). 128 MB alloc+touch reads 0.02–0.08 s on healthy
  *     hardware — one full second is degradation on any box this
  *     bench targets. probe_io gets no absolute rail: its magnitude
  *     scales with the fixture, so only the spread is meaningful
  *     while the input stays page-cached (the verdict's own carve-out).
  *
  * Two verdicts land in-band:
  *   - `box_hot` — NO pass was quiet: the run never saw the box at
  *     rest, totals are box-contaminated (v9's p32-only meaning,
  *     extended to all probe axes).
  *   - `box_drift` — some query's MIN sample came from a non-quiet
  *     pass: even if quiet passes existed, that query's committed
  *     number wasn't taken during one. This is the exact r19 failure
  *     mode (q_dedup_minhash_pairs 6.9 s official / 0.9 s quiet in a
  *     run whose probe_mem spanned 0.017–9.4 s).
  *
  * The retry loop fires on either verdict, so a transient spike ends
  * with quiet-pass samples in every per-query min — and a quiet pass
  * normally also WINS the min (contention slows the engine too), so
  * drift self-clears when the retry lands on a calm box.
  */
private[graft] object BenchGate {

  /** probe32 ceiling factor over the run's best probe1 (v9 value). */
  val HotFactor = 1.6

  /** probe_mem spread ceiling over the run's best reading (quiet boxes
    * measure ≤ 5×; the r19 contended run read 555×).
    */
  val MemSpreadFactor = 8.0

  /** Floor for the mem spread's denominator (quiet readings 0.017+ s). */
  val MemFloorSec = 0.02

  /** Absolute probe_mem ceiling — catches uniform mem starvation the
    * spread cannot see (quiet ≤ 0.083 s measured; 12× headroom).
    */
  val MemAbsCeilingSec = 1.0

  /** probe_io spread ceiling over the run's best reading. */
  val IoSpreadFactor = 8.0

  /** Floor for the io spread's denominator (page-cached reads are
    * single-digit ms — sub-floor jitter is not contention).
    */
  val IoFloorSec = 0.05

  def cpuCeiling(p1Min: Double): Double = p1Min * HotFactor

  def memCeiling(pMemMin: Double): Double =
    math.min(MemSpreadFactor * math.max(pMemMin, MemFloorSec), MemAbsCeilingSec)

  def ioCeiling(pIoMin: Double): Double = IoSpreadFactor * math.max(pIoMin, IoFloorSec)

  /** Quietness of ONE pass's probe readings against the run-wide floors. */
  def passQuiet(
      p1Min: Double, p32: Double,
      pIoMin: Double, pIo: Double,
      pMemMin: Double, pMem: Double): Boolean =
    p32 <= cpuCeiling(p1Min) && pIo <= ioCeiling(pIoMin) && pMem <= memCeiling(pMemMin)

  /** Per-pass quiet flags for parallel probe arrays (all same length). */
  def quietFlags(p1: Seq[Double], p32: Seq[Double], pIo: Seq[Double], pMem: Seq[Double])
      : Seq[Boolean] = {
    // advertised as the pure, reusable criterion: misuse with
    // length-mismatched probe arrays must fail loudly, not index past
    // an array or silently mis-adjudicate (round-20 ADVICE)
    require(
      p1.length == p32.length && p32.length == pIo.length && pIo.length == pMem.length,
      s"probe arrays must be parallel: p1=${p1.length} p32=${p32.length} " +
        s"io=${pIo.length} mem=${pMem.length}")
    if (p1.isEmpty) Seq.empty
    else {
      val (p1Min, ioMin, memMin) = (p1.min, pIo.min, pMem.min)
      p32.indices.map(i => passQuiet(p1Min, p32(i), ioMin, pIo(i), memMin, pMem(i)))
    }
  }

  /** `box_hot`: the run never saw a quiet pass. */
  def boxHot(quiet: Seq[Boolean]): Boolean = quiet.isEmpty || !quiet.contains(true)

  /** `box_drift`: some committed per-query min was sampled in a
    * non-quiet pass. `minPasses` = for each query, the pass index of
    * its minimum sample.
    */
  def drift(minPasses: Iterable[Int], quiet: Seq[Boolean]): Boolean =
    minPasses.exists(p => p < 0 || p >= quiet.length || !quiet(p))
}
