package graft.text

/** IVF (inverted-file) coarse quantizer for embedding ANN — the classic
  * scale path next to hyperplane LSH ([[VectorLsh]]): partition the vector
  * table into K Voronoi cells around a small broadcast codebook, then
  * answer a query by scanning only the `nprobe` nearest cells (an equi-join
  * on `cluster`, never a cross join). Scan fraction ≈ nprobe/K; recall is
  * governed by how often the true neighbor's cell ranks inside the query's
  * top-`nprobe` cells (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search" §IV-A — the IVF layer, without the PQ codes).
  *
  * Two codebook paths: deterministic data-point pivots (lowest vec_ids —
  * what the oracle-gated query pins, reproducible against a closed-form
  * oracle) and [[kmeans]], a deterministic driver-side Lloyd over a hash
  * sample — the production path ([[VectorIvfIndex.fit]]), which recovers
  * cells aligned with the data's true clusters where low-id pivots cannot.
  * Either way the model is O(K·dim) floats broadcast to every executor —
  * the table itself is never collected.
  *
  * No reference counterpart (builder-brief addition, like [[VectorLsh]]).
  */
object VectorIvf {

  /** Indices of the `nprobe` centroids nearest to `v` by cosine, best
    * first; ties break to the lower index (deterministic). `centroids` is
    * row-major `[k][dim]`.
    */
  def topClusters(vs: Seq[Float], centroids: Array[Array[Float]], nprobe: Int): Array[Int] = {
    // primitive array up front: Spark hands UDFs a List, where indexed
    // access inside the per-centroid loop would be quadratic in dim
    val v = TextFunctions.floats(vs)
    val k = centroids.length
    val n = math.min(nprobe, k)
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      sims(c) = TextFunctions.cosineArrays(v, centroids(c))
      c += 1
    }
    // selection by repeated max: k is small (codebook, not data), so the
    // O(k·nprobe) pass beats sorting allocations on the per-row hot path
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var i = 0
    while (i < n) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      c = 0
      while (c < k) {
        if (!taken(c) && sims(c) > bestSim) { best = c; bestSim = sims(c) }
        c += 1
      }
      if (best < 0) {
        // every remaining similarity is NaN (NaN payload in the vector or a
        // centroid): fall back to the lowest untaken index — deterministic,
        // and a UDF crash inside an executor would fail the whole query
        c = 0
        while (best < 0 && c < k) { if (!taken(c)) best = c; c += 1 }
      }
      taken(best) = true
      out(i) = best
      i += 1
    }
    out
  }

  /** The cell a vector is stored in: its single nearest centroid;
    * -1 on an empty codebook (joins then simply match nothing).
    */
  def assign(v: Seq[Float], centroids: Array[Array[Float]]): Int =
    if (centroids.isEmpty) -1 else topClusters(v, centroids, 1)(0)

  // single source of truth for the arithmetic (bit-exactness across the
  // library depends on every path sharing one implementation)
  private def cosine(a: Array[Float], b: Array[Float]): Double =
    TextFunctions.cosineArrays(a, b)

  private def unit(v: Array[Float]): Array[Float] = {
    var n = 0.0; var i = 0
    while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
    if (n == 0) v.clone()
    else {
      val s = 1.0 / math.sqrt(n)
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) * s).toFloat; i += 1 }
      out
    }
  }

  /** Deterministic spherical k-means over a driver-side sample — the
    * production codebook path (vs the data-point pivots the oracle-gated
    * query pins): farthest-first init (greedy k-center from the first
    * sample point, ties to the lower index — no RNG, so the codebook is
    * reproducible run-to-run) followed by `iters` Lloyd rounds under the
    * cosine metric (assign to nearest centroid by cosine; recenter on the
    * mean of the members' UNIT vectors, so a long vector cannot dominate a
    * direction cell). An emptied cluster keeps its previous centroid.
    * Cost is O(sample × k × dim × iters) on the driver — the sample is
    * bounded (see [[VectorIvfIndex.fit]]), never the table.
    */
  def kmeans(sample: Array[Array[Float]], k: Int, iters: Int = 10): Array[Array[Float]] = {
    require(sample.nonEmpty, "kmeans needs a non-empty sample")
    val n = sample.length
    val kk = math.max(1, math.min(k, n))
    // normalize the sample ONCE — cosine is scale-invariant, so init,
    // assignment and recentering all consume the same unit vectors;
    // re-deriving them per use would be O(n·dim·iters) allocation churn
    val units: Array[Array[Float]] = sample.map(unit)
    // zero vectors (null/empty-content embeddings) carry no direction:
    // cosine(0, x) = 0 makes them look maximally distant from EVERYTHING,
    // themselves included, so unguarded farthest-first would burn centroid
    // slots on zero (or duplicate) picks. They stay assignable as data but
    // are never picked as seeds while a nonzero candidate remains.
    val isZero = units.map(u => !u.exists(_ != 0f))
    // farthest-first init on cosine distance
    val chosen = new Array[Int](kk)
    chosen(0) = units.indices.find(i => !isZero(i)).getOrElse(0)
    val minDist = Array.fill(n)(Double.MaxValue)
    minDist(chosen(0)) = Double.NegativeInfinity // a seed is never re-picked
    var c = 0
    while (c < kk - 1) {
      var i = 0
      while (i < n) {
        val d = 1.0 - cosine(units(i), units(chosen(c)))
        if (d < minDist(i)) minDist(i) = d
        i += 1
      }
      var best = -1; var bestD = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!isZero(i) && minDist(i) > bestD) { bestD = minDist(i); best = i }
        i += 1
      }
      if (best < 0) { // only zero (or already-seeded) candidates remain
        i = 0
        while (i < n) { if (minDist(i) > bestD) { bestD = minDist(i); best = i }; i += 1 }
      }
      minDist(best) = Double.NegativeInfinity
      chosen(c + 1) = best
      c += 1
    }
    var cents: Array[Array[Float]] = chosen.map(units(_))
    var it = 0
    while (it < iters) {
      val dim = cents(0).length
      val sums = Array.ofDim[Double](kk, dim)
      val counts = new Array[Int](kk)
      var i = 0
      while (i < n) {
        val u = units(i)
        val cell = assign(scala.collection.immutable.ArraySeq.unsafeWrapArray(u), cents)
        var d = 0
        while (d < math.min(dim, u.length)) { sums(cell)(d) += u(d); d += 1 }
        counts(cell) += 1
        i += 1
      }
      cents = Array.tabulate(kk) { cell =>
        if (counts(cell) == 0) cents(cell) // empty cell keeps its centroid
        else {
          val m = new Array[Float](dim)
          var d = 0
          while (d < dim) { m(d) = (sums(cell)(d) / counts(cell)).toFloat; d += 1 }
          unit(m)
        }
      }
      it += 1
    }
    cents
  }
}
