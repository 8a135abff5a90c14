package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

import Golden._

/** Bit-exact parity with /root/reference/src/bloom.js via node goldens. */
class BloomGoldenSpec extends AnyFunSuite {
  private val g = Golden.load("bloom.json")

  test("add/export/query/size/union/jaccard/cover match reference exactly") {
    arr(g \ "cases").foreach { c =>
      val w = int(c \ "w"); val d = int(c \ "d")
      val a = BloomSketch(w, d)
      val b = BloomSketch(w, d)
      strings(c \ "addA").foreach(a.add)
      strings(c \ "addB").foreach(b.add)

      assert(a.words.toSeq == ints(c \ "exportA" \ "bits"), s"bits A (w=$w,d=$d)")
      assert(b.words.toSeq == ints(c \ "exportB" \ "bits"), "bits B")
      assert(int(c \ "exportA" \ "depth") == a.depth)

      val u = a.union(b)
      assert(u.words.toSeq == ints(c \ "exportU" \ "bits"), "bits U")

      val probeList = strings(c \ "addA") ++ strings(c \ "addB") ++
        Seq("1", "2", "3", "4", "5", "6", "7", "8", "9", "•", "zz", "yy", "xx")
      val queryA = arr(c \ "queryA").map(bool)
      probeList.take(queryA.size).zip(queryA).foreach { case (v, e) =>
        assert(a.query(v) == e, s"queryA($v)")
      }
      val queryU = arr(c \ "queryU").map(bool)
      probeList.take(queryU.size).zip(queryU).foreach { case (v, e) =>
        assert(u.query(v) == e, s"queryU($v)")
      }

      assert(a.size === double(c \ "sizeA"), "sizeA")
      assert(b.size === double(c \ "sizeB"), "sizeB")
      assert(u.size === double(c \ "sizeU"), "sizeU")
      assert(a.jaccard(b) === double(c \ "jaccard"), "jaccard")
      assert(a.cover(b) === double(c \ "cover"), "cover")
    }
  }

  test("create sizing matches the reference's truncation math") {
    arr(g \ "create").foreach { c =>
      val f = BloomSketch.create(int(c \ "n"), double(c \ "p"))
      assert(f.width == int(c \ "w"))
      assert(f.depth == int(c \ "d"))
    }
  }

  test("binary codec round-trips exactly") {
    val a = BloomSketch(1024, 3)
    Seq("x", "y", "z", "•", "conv-1").foreach(a.add)
    val back = BloomSketch.fromBytes(a.toBytes)
    assert(back.width == a.width && back.depth == a.depth)
    assert(back.words.toSeq == a.words.toSeq)
    assert(back.toBytes.toSeq == a.toBytes.toSeq)
  }

  test("union enforces parameter equality") {
    intercept[IllegalArgumentException](BloomSketch(1024, 3).unionInPlace(BloomSketch(2048, 3)))
    intercept[IllegalArgumentException](BloomSketch(1024, 3).unionInPlace(BloomSketch(1024, 4)))
  }
}
