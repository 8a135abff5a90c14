package graft.sketch

/** Empirical bias correction for HyperLogLog++ (Heule, Nunkesser & Hall 2013,
  * §5 + appendix). For raw estimates e ≤ 5m the raw HLL estimator carries a
  * predictable positive bias; the paper publishes, per precision p, ~200
  * (rawEstimate, bias) pairs measured on uniform hashes, and corrects by
  * subtracting the k-nearest-neighbor (k=6) interpolated bias.
  *
  * The tables themselves are the paper's published appendix data; they are
  * consumed from Apache Spark's bundled copy
  * (`org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper`) rather
  * than re-vendored here. `THRESHOLDS` is the paper's empirically-determined
  * crossover under which linear counting beats the corrected raw estimate.
  */
object HllBias {
  import org.apache.spark.sql.catalyst.util.{HyperLogLogPlusPlusHelper => H}

  private val K = 6 // nearest neighbors averaged, as in the paper's code

  /** Linear-counting-vs-corrected-estimate crossover threshold for p. */
  def threshold(p: Int): Double = H.THRESHOLDS(p - 4)

  /** kNN-interpolated bias of raw estimate `e` at precision `p`. */
  def estimateBias(e: Double, p: Int): Double = {
    val estimates = H.RAW_ESTIMATE_DATA(p - 4)
    val biases = H.BIAS_DATA(p - 4)
    val n = estimates.length
    // insertion point of e in the ascending rawEstimate grid
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (estimates(mid) < e) lo = mid + 1 else hi = mid
    }
    // expand to the K nearest grid points by absolute distance
    var l = lo - 1
    var r = lo
    var taken = 0
    var sum = 0.0
    while (taken < K && (l >= 0 || r < n)) {
      val takeLeft =
        if (l < 0) false
        else if (r >= n) true
        else (e - estimates(l)) <= (estimates(r) - e)
      if (takeLeft) { sum += biases(l); l -= 1 }
      else { sum += biases(r); r += 1 }
      taken += 1
    }
    if (taken == 0) 0.0 else sum / taken
  }
}
