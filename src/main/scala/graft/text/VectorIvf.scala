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
  * The codebook here is a deterministic set of data-point pivots (lowest
  * vec_ids) so the whole pipeline is reproducible against a closed-form
  * oracle; at production scale you'd Lloyd-iterate on a driver-side sample
  * first. Either way the model is O(K·dim) floats broadcast to every
  * executor — the table itself is never collected.
  *
  * No reference counterpart (builder-brief addition, like [[VectorLsh]]).
  */
object VectorIvf {

  /** Indices of the `nprobe` centroids nearest to `v` by cosine, best
    * first; ties break to the lower index (deterministic). `centroids` is
    * row-major `[k][dim]`.
    */
  def topClusters(v: Seq[Float], centroids: Array[Array[Float]], nprobe: Int): Array[Int] = {
    val k = centroids.length
    val n = math.min(nprobe, k)
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      // inline cosine against the raw centroid array: the implicit
      // Array→Seq wrapper would copy 64 floats per (row, centroid) pair
      val cen = centroids(c)
      val dim = math.min(v.length, cen.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < dim) {
        val x = v(i).toDouble; val y = cen(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      sims(c) = if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
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
}
