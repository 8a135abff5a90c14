package graft.sketch

import org.scalatest.funsuite.AnyFunSuite

import Golden._

/** Bit-exact parity with /root/reference/src/count-min.js and
  * count-mean-min.js via node goldens. Our counters are Long (documented
  * deviation, SURVEY.md §7.7) — values at golden scale are identical.
  */
class CmsGoldenSpec extends AnyFunSuite {
  private val g = Golden.load("cms.json")
  private val gm = Golden.load("cmm.json")

  private def probes: Seq[String] =
    "abcdefghij".map(_.toString) ++ "klmnopqrst".map(_.toString) ++
      "123456789•".map(_.toString)

  test("CMS add/export/query/dot match reference exactly") {
    arr(g \ "cases").foreach { c =>
      val w = int(c \ "w"); val d = int(c \ "d")
      val a = CmsSketch(w, d)
      val b = CmsSketch(w, d)
      strings(c \ "addsA").foreach(v => a.add(v))
      strings(c \ "addsB").foreach(v => b.add(v))

      assert(a.num == long(c \ "exportA" \ "num"), "numA")
      assert(a.table.toSeq == longs(c \ "exportA" \ "counts"), s"table A (w=$w,d=$d)")
      assert(b.table.toSeq == longs(c \ "exportB" \ "counts"), "table B")

      probes.zip(longs(c \ "queryA")).foreach { case (v, e) =>
        assert(a.query(v) == e, s"queryA($v)")
      }
      probes.zip(longs(c \ "queryB")).foreach { case (v, e) =>
        assert(b.query(v) == e, s"queryB($v)")
      }
      assert(a.dot(b) === double(c \ "dot"), "dot")
    }
  }

  test("CMS create sizing matches reference (incl. d=7 vs ctor d=9 quirk)") {
    arr(g \ "create").foreach { c =>
      val s = CmsSketch.create(long(c \ "n"), double(c \ "e"), double(c \ "p"))
      assert(s.width == int(c \ "w"), s"w for n=${long(c \ "n")}")
      assert(s.depth == int(c \ "d"), "d")
    }
    // defaults quirk: plain ctor d=9, create() default d=⌈ln 1000⌉=7
    assert(CmsSketch().depth == 9)
    assert(CmsSketch.create(0).depth == 7)
  }

  test("CMM bias-corrected query/dot match reference exactly") {
    arr(gm \ "cases").foreach { c =>
      val w = int(c \ "w"); val d = int(c \ "d")
      val a = CmmSketch(w, d)
      val b = CmmSketch(w, d)
      strings(c \ "addsA").foreach(v => a.add(v))
      strings(c \ "addsB").foreach(v => b.add(v))

      probes.zip(doubles(c \ "queryA")).foreach { case (v, e) =>
        assert(a.queryMean(v) === e, s"cmm queryA($v)")
      }
      probes.zip(doubles(c \ "queryB")).foreach { case (v, e) =>
        assert(b.queryMean(v) === e, s"cmm queryB($v)")
      }
      assert(a.dotMean(b) === double(c \ "dot"), "cmm dot")
    }
  }

  test("merge is exact: merged table == sum of tables, num additive") {
    val a = CmsSketch(1021, 3); val b = CmsSketch(1021, 3)
    val whole = CmsSketch(1021, 3)
    val vs = (0 until 500).map(i => s"v${i % 37}")
    vs.take(250).foreach { v => a.add(v); whole.add(v) }
    vs.drop(250).foreach { v => b.add(v); whole.add(v) }
    val m = CmsSketch.fromBytes(a.toBytes).mergeInPlace(b)
    assert(m.table.toSeq == whole.table.toSeq)
    assert(m.num == whole.num)
    vs.distinct.foreach(v => assert(m.query(v) == whole.query(v)))
  }

  test("binary codec round-trips (CMS and CMM tags distinct)") {
    val a = CmsSketch(101, 3); a.add("x"); a.add("y", 5)
    val back = CmsSketch.fromBytes(a.toBytes)
    assert(back.table.toSeq == a.table.toSeq && back.num == a.num)
    val c = CmmSketch(101, 3); c.add("x")
    val cb = CmmSketch.fromBytes(c.toBytes)
    assert(cb.table.toSeq == c.table.toSeq)
    intercept[IllegalArgumentException](CmsSketch.fromBytes(c.toBytes))
  }
}
