package graft.sketch

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import Golden._

/** Exact parity with /root/reference/src/ngram.js via node goldens. */
class NGramGoldenSpec extends AnyFunSuite {
  private val g = Golden.load("ngram.json")

  test("add/export/query/size/norm/dot/cosine match reference exactly") {
    arr(g \ "cases").foreach { c =>
      val n = int(c \ "n"); val cs = bool(c \ "cs")
      val a = NGramSketch(n, cs)
      val b = NGramSketch(n, cs)
      a.add((c \ "sA") match { case JString(s) => s; case _ => fail() })
      b.add((c \ "sB") match { case JString(s) => s; case _ => fail() })
      a.add((c \ "extra") match { case JString(s) => s; case _ => fail() })

      val expA = (c \ "exportA" \ "counts") match {
        case JObject(fields) => fields.map { case (k, v) => k -> long(v) }.toMap
        case o               => sys.error(s"bad counts $o")
      }
      assert(a.counts.toMap == expA, s"counts A (n=$n, cs=$cs)")
      val expB = (c \ "exportB" \ "counts") match {
        case JObject(fields) => fields.map { case (k, v) => k -> long(v) }.toMap
        case o               => sys.error(s"bad counts $o")
      }
      assert(b.counts.toMap == expB, "counts B")

      assert(a.size == int(c \ "sizeA"))
      assert(b.size == int(c \ "sizeB"))
      assert(a.norm === double(c \ "normA"))
      assert(b.norm === double(c \ "normB"))
      assert(a.dot(b) === double(c \ "dot"))
      assert(a.cosine(b) === double(c \ "cosine"))

      Seq("ab", "aB", "bc", "zz", "e ").zip(arr(c \ "queries")).foreach {
        case (k, JArray(List(ea, eb))) =>
          assert(a.query(k) == long(ea), s"queryA($k)")
          assert(b.query(k) == long(eb), s"queryB($k)")
        case other => fail(s"bad query golden $other")
      }
    }
  }

  test("merge is exact map-union; null/empty ignored") {
    val a = NGramSketch(); val b = NGramSketch(); val whole = NGramSketch()
    a.add("hello world"); whole.add("hello world")
    b.add("world order"); whole.add("world order")
    a.add(null); a.add("")
    val m = NGramSketch.fromBytes(a.toBytes).mergeInPlace(b)
    assert(m.counts.toMap == whole.counts.toMap)
    assert(m.norm === whole.norm)
  }

  test("binary codec round-trips") {
    val a = NGramSketch(3, caseSensitive = true)
    a.add("The Quick Brown")
    val back = NGramSketch.fromBytes(a.toBytes)
    assert(back.n == 3 && back.caseSensitive)
    assert(back.counts.toMap == a.counts.toMap)
  }
}
