package graft.sim

/** Probe geometry derived from MEASURED index statistics — the ANN
  * counterpart of [[Similarity.lshParamsForTable]] (ROADMAP: parameters
  * must track the data, not be re-tuned by hand as corpora grow).
  *
  * Safety argument: IVF/PQ recall is MONOTONE in both knobs — probing more
  * cells only adds candidates, a longer shortlist only adds rerank
  * survivors — so clamping every derived value to the recall-swept floor
  * (the constants proven full-recall on the test corpora) preserves the
  * exact-oracle property while letting geometry GROW with corpus size and
  * cluster imbalance.
  */
object AnnGeometry {

  /** Smallest nprobe whose worst-case candidate pool — the `nprobe`
    * SMALLEST cells, the pessimistic draw under the measured histogram —
    * still holds `minCandidates` vectors. Balanced clusters reduce this to
    * ceil(minCandidates / avgCell); skew (some cells near-empty) pushes it
    * up, which is exactly when a fixed nprobe silently loses recall. */
  def nprobe(clusterSizes: Seq[Long], minCandidates: Long, floor: Int): Int = {
    require(clusterSizes.nonEmpty, "empty cluster histogram")
    val asc = clusterSizes.sorted
    var cum = 0L
    var p = 0
    while (p < asc.length && cum < minCandidates) { cum += asc(p); p += 1 }
    math.min(clusterSizes.length, math.max(floor, p))
  }

  /** Rerank shortlist sized to corpus count: ADC ranking noise is roughly
    * per-item constant, so the expected number of false positives ranked
    * above the true k-th neighbor grows with N — shortlist follows
    * ceil(c·k·sqrt(N)) (c calibrated on the recall sweeps: c=1 with k=10
    * reproduces the proven shortlist 128 near N=1600). */
  def shortlist(n: Long, k: Int, floor: Int, c: Double = 1.0): Int =
    math.max(floor, math.ceil(c * k * math.sqrt(math.max(0L, n).toDouble)).toInt)

  /** Candidate floor for [[nprobe]]: enough cells to cover the rerank
    * shortlist with headroom, never fewer than an oversample of k. */
  def minCandidates(k: Int, shortlist: Int, oversample: Int = 4): Long =
    math.max(k.toLong * oversample, shortlist.toLong)
}
