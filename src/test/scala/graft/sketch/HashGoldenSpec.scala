package graft.sketch

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.core.Fnv1a
import Golden._

/** Bit-exact parity with the reference FNV-1a chain
  * (/root/reference/src/hash.js) via node-generated vectors.
  */
class HashGoldenSpec extends AnyFunSuite {
  private val g = Golden.load("hash.json")
  private val ss = strings(g \ "strings")

  test("fnv_1a matches reference bit-for-bit") {
    val expected = ints(g \ "fnv_1a")
    ss.zip(expected).foreach { case (s, e) =>
      assert(Fnv1a.fnv1a(s) == e, s"fnv_1a(${s.take(20)})")
    }
  }

  test("fnv_1a_b matches reference bit-for-bit") {
    val expected = ints(g \ "fnv_1a_b")
    ss.zip(expected).foreach { case (s, e) =>
      assert(Fnv1a.fnv1aB(Fnv1a.fnv1a(s)) == e, s"fnv_1a_b(${s.take(20)})")
    }
  }

  test("locations matches reference for every (d, w) config") {
    arr(g \ "locations").foreach { cfg =>
      val d = int(cfg \ "d"); val w = int(cfg \ "w")
      val rows = arr(cfg \ "rows").map(ints)
      val out = new Array[Int](d)
      ss.zip(rows).foreach { case (s, expected) =>
        Fnv1a.locations(s, d, w, out)
        assert(out.toSeq == expected, s"locations(${s.take(20)}, d=$d, w=$w)")
      }
    }
  }
}
