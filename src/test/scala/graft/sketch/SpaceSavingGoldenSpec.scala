package graft.sketch

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

import Golden._

/** Exact parity with /root/reference/src/stream-summary.js via node goldens,
  * plus the distributed-merge guarantee tests the reference lacks.
  */
class SpaceSavingGoldenSpec extends AnyFunSuite {
  private val g = Golden.load("stream-summary.json")

  private def runScript(c: JValue): SpaceSavingSketch = {
    val ss = SpaceSavingSketch(int(c \ "w"))
    arr(c \ "script").foreach {
      case JArray(List(JString(v), cnt)) => ss.add(v, long(cnt))
      case other                         => fail(s"bad script row $other")
    }
    ss
  }

  test("scripted sequences produce identical state/top-k/query/error") {
    arr(g \ "cases").foreach { c =>
      val ss = runScript(c)

      // export: ascending buckets, each [count, v1, e1, v2, e2, ...]
      val expBuckets = arr(c \ "export" \ "buckets").map {
        case JArray(count :: rest) =>
          val entries = rest.grouped(2).map {
            case List(JString(v), e) => (v, long(e))
            case o                   => fail(s"bad entry $o")
          }.toSeq
          (long(count), entries)
        case o => fail(s"bad bucket $o")
      }
      assert(ss.exportBuckets == expBuckets, s"buckets (w=${int(c \ "w")})")

      val top = ss.topK()
      assert(top.map(_._1) == strings(c \ "values"), "values order")
      assert(top.map(_._2) == longs(c \ "counts"), "counts")
      assert(top.map(_._3) == longs(c \ "errors"), "errors")
      assert(ss.topK(Some(2)).map(_._1) == strings(c \ "top2values"))
      assert(ss.topK(Some(2)).map(_._2) == longs(c \ "top2counts"))
      assert(ss.topK(Some(0)).isEmpty)

      val probes = Seq("1", "2", "3", "4", "5", "a", "b", "q")
      probes.zip(longs(c \ "query")).foreach { case (v, e) =>
        assert(ss.query(v) == e, s"query($v)")
      }
      probes.zip(longs(c \ "error")).foreach { case (v, e) =>
        assert(ss.error(v) == e, s"error($v)")
      }
    }
  }

  test("binary codec round-trips full structure") {
    arr(g \ "cases").foreach { c =>
      val ss = runScript(c)
      val back = SpaceSavingSketch.fromBytes(ss.toBytes)
      assert(back.exportBuckets == ss.exportBuckets)
      assert(back.topK() == ss.topK())
      // adds after deserialization continue correctly
      ss.add("post", 2); back.add("post", 2)
      assert(back.exportBuckets == ss.exportBuckets)
    }
  }

  test("merge preserves true <= est <= true + error for tracked values") {
    val rnd = new Golden.Lcg(99)
    val truth = scala.collection.mutable.HashMap.empty[String, Long]
    def stream(k: Int): Seq[String] =
      (0 until 2000).map { _ =>
        val v = "t" + math.floor(math.pow(rnd.next(), 3) * 40).toInt
        v
      }
    val parts = (0 until 4).map { k =>
      val ss = SpaceSavingSketch(20)
      stream(k).foreach { v =>
        ss.add(v)
        truth.update(v, truth.getOrElse(v, 0L) + 1)
      }
      ss
    }
    val merged = parts.reduce { (a, b) =>
      SpaceSavingSketch.fromBytes(a.toBytes).mergeInPlace(b)
    }
    assert(merged.trackedSize <= 20)
    merged.topK().foreach { case (v, est, err) =>
      val t = truth(v)
      assert(est >= t, s"$v: est $est < true $t")
      assert(est - err <= t, s"$v: est-err ${est - err} > true $t")
    }
    // heaviest true value must be tracked and ranked first
    val heaviest = truth.maxBy(_._2)._1
    assert(merged.topK().head._1 == heaviest)
  }

  test("merge determinism: same inputs, same result regardless of map order") {
    val a1 = SpaceSavingSketch(5); val b1 = SpaceSavingSketch(5)
    val a2 = SpaceSavingSketch(5); val b2 = SpaceSavingSketch(5)
    Seq("x", "y", "x", "z", "w", "q", "x").foreach { v => a1.add(v); a2.add(v) }
    Seq("y", "y", "m", "n", "o", "p").foreach { v => b1.add(v); b2.add(v) }
    val m1 = a1.mergeInPlace(b1)
    val m2 = a2.mergeInPlace(b2)
    assert(m1.exportBuckets == m2.exportBuckets)
    assert(m1.toBytes.toSeq == m2.toBytes.toSeq)
  }
}
