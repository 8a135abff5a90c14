package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.core.XxHash64

/** Random-hyperplane LSH: collision probability tracks (1 − θ/π)^bits and
  * the bucket-join pipeline recovers true nearest neighbors with usable
  * recall even on unclustered Gaussian vectors (worst case for ANN).
  */
class VectorLshSpec extends AnyFunSuite {

  private def randVec(id: Long, dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = XxHash64.hashLong(id * 1000 + i, 42L)
      v(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      i += 1
    }
    v
  }
  private def cos(a: Array[Float], b: Array[Float]): Double =
    TextFunctions.cosine(a, b)

  test("identical vectors collide in every table; perturbed ones in most") {
    val v = randVec(1, 64)
    val same = VectorLsh.bucketKeys(v, 12, 8)
    assert(same.toSeq == VectorLsh.bucketKeys(v.clone(), 12, 8).toSeq)
    val perturbed = v.clone()
    perturbed(0) += 0.01f
    val p = VectorLsh.bucketKeys(perturbed, 12, 8)
    assert(same.toSet.intersect(p.toSet).size >= 6, "tiny perturbation keeps most buckets")
  }

  test("perturb makes a deterministic near-duplicate with high cosine") {
    val v = randVec(7, 64)
    val p1 = VectorLsh.perturb(v.toSeq, 7L, 0.15)
    val p2 = VectorLsh.perturb(v.toSeq, 7L, 0.15)
    assert(p1.toSeq == p2.toSeq, "perturb must be deterministic")
    assert(cos(v, p1) > 0.9, s"cos=${cos(v, p1)}")
    val other = VectorLsh.perturb(v.toSeq, 8L, 0.15)
    assert(other.toSeq != p1.toSeq, "different ids must perturb differently")
  }

  test("exact shingle jaccard: identity, disjoint, and known overlap") {
    import TextFunctions.exactShingleJaccard
    assert(exactShingleJaccard("abcdefgh", "abcdefgh", 5) == 1.0)
    assert(exactShingleJaccard("aaaaa", "bbbbb", 5) == 0.0)
    // "abcdef" -> {abcde, bcdef}; "abcdeX" -> {abcde}: J = 1/2
    assert(exactShingleJaccard("abcdef", "abcde", 5) == 0.5)
    assert(exactShingleJaccard("ABCDEF", "abcdef", 5) == 1.0, "case-folded")
    assert(exactShingleJaccard(null, "abcdef", 5) == 0.0)
  }

  test("signatures are deterministic across 'executors' (fresh cache)") {
    val v = randVec(7, 32)
    assert(VectorLsh.signature(v, 16, 3) == VectorLsh.signature(v.toSeq, 16, 3))
  }

  test("bucket-join candidates + exact rerank recover near neighbors") {
    val dim = 64
    val n = 400
    // plant 20 query vectors, each with a true near-duplicate (cos > 0.95)
    val base = (0 until n).map(i => randVec(i, dim)).toArray
    val planted = (0 until 20).map { q =>
      val nd = base(q).clone()
      var i = 0
      while (i < dim) { nd(i) = nd(i) + 0.1f * randVec(1000 + q, dim)(i); i += 1 }
      (n + q, nd)
    }
    val all: Map[Int, Array[Float]] =
      base.zipWithIndex.map { case (v, i) => i -> v }.toMap ++
        planted.map { case (i, v) => i -> v }.toMap

    // LSH index: bucket → ids
    val buckets = scala.collection.mutable.HashMap.empty[Long, List[Int]]
    all.foreach { case (id, v) =>
      VectorLsh.bucketKeys(v, 10, 12).foreach { k =>
        buckets.update(k, id :: buckets.getOrElse(k, Nil))
      }
    }
    var hits = 0
    (0 until 20).foreach { q =>
      val qv = base(q)
      val cand = VectorLsh.bucketKeys(qv, 10, 12)
        .flatMap(k => buckets.getOrElse(k, Nil)).toSet - q
      // exact rerank inside candidates only
      if (cand.nonEmpty) {
        val best = cand.maxBy(id => cos(qv, all(id)))
        if (best == n + q) hits += 1
      }
      // sanity: the planted near-dup really is the global nearest
      val globalBest = (all.keySet - q).maxBy(id => cos(qv, all(id)))
      assert(globalBest == n + q, s"planted near-dup should be nearest for $q")
    }
    assert(hits >= 16, s"LSH recall@1 for planted near-dups: $hits/20")
  }
}
