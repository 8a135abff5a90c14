package graft
import graft.sketch._
/** Single-thread per-sketch add-cost probe (ns/add). */
object SketchMicroBench {
  def main(args: Array[String]): Unit = {
    val n = 4000000
    val keys = Array.tabulate(1024)(i => f"conv-$i%08d")
    val tools = Array.tabulate(50)(i => f"tool_$i%02d")
    def time(name: String)(f: Int => Unit): Unit = {
      var i = 0
      while (i < n / 4) { f(i); i += 1 } // warmup
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f(i); i += 1 }
      println(f"$name%-14s ${(System.nanoTime() - t0).toDouble / n}%8.1f ns/add")
    }
    val hll = HllSketch()
    time("hll")(i => hll.add(keys(i & 1023)))
    val cms = CmsSketch()
    time("cms")(i => cms.add(tools(i % 50)))
    val bloom = BloomSketch()
    time("bloom")(i => bloom.add(keys(i & 1023)))
    val topk = SpaceSavingSketch(100)
    time("topk")(i => topk.add(tools(i % 50)))
    val td = TDigestSketch()
    time("tdigest-ref")(i => td.add((i % 1000) * 0.5))
    val tdf = TDigestSketch.fast()
    time("tdigest-fast")(i => tdf.add((i % 1000) * 0.5))
    val kll = KllSketch()
    time("kll")(i => kll.add((i % 1000) * 0.5))
    val ng = NGramSketch()
    time("ngram(12ch)")(i => ng.add(keys(i & 1023)))
    val mh = graft.text.MinHashSketch(128)
    time("minhash(12ch)")(i => mh.addText(keys(i & 1023), 5))
    println("---- combined per-row (hll+cms+bloom+topk+td+kll) ----")
    val h2 = HllSketch(); val c2 = CmsSketch(); val b2 = BloomSketch()
    val t2 = SpaceSavingSketch(100); val d2 = TDigestSketch.fast(); val k2 = KllSketch()
    time("row")(i => {
      val key = keys(i & 1023)
      h2.add(key); b2.add(key)
      if ((i & 3) == 0) { c2.add(tools(i % 50)); t2.add(tools(i % 50)) }
      d2.add((i % 1000) * 0.5); k2.add((i % 1000) * 0.5)
    })
  }
}
