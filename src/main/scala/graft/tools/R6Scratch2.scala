package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Round-6 prototype validation: new bfTop1 shape + fused synth-simhash.
  * Checks bit-identical outputs vs the current shapes, then times both.
  */
object R6Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch2")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tfns = graft.text.TextSqlFunctions.default
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeIt(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R6S2 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val probes = broadcast(emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("query_id"),
        tfns.perturbUdf(col("embedding"), col("vec_id"), lit(0.15)).as("qe")))

    def top1(df: DataFrame, as: String): DataFrame =
      df.groupBy(col("query_id"))
        .agg(max_by(col("neighbor_id"), struct(col("s"), -col("neighbor_id"))).as(as))

    // OLD gate
    def bfOld(p: DataFrame, e: DataFrame): DataFrame =
      top1(p.crossJoin(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")))
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s")), "bf_top1")

    // NEW gate: bounded probe collect + broadcast + one partition-local loop
    def bfNew(p: DataFrame, e: DataFrame): DataFrame = {
      val sess = e.sparkSession
      import sess.implicits._
      val collected = p.select(col("query_id"), col("qe")).collect()
        .map(r => (r.getLong(0), TextFunctions.floats(r.getSeq[Float](1))))
      val qids = collected.map(_._1)
      val qes = collected.map(_._2)
      val bc = sess.sparkContext.broadcast(qes)
      val partials = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
        .as[(Long, Array[Float])]
        .mapPartitions { it =>
          val qs = bc.value
          val bestS = Array.fill(qs.length)(Double.NegativeInfinity)
          val bestId = new Array[Long](qs.length)
          var any = false
          while (it.hasNext) {
            val (nid, ne) = it.next()
            any = true
            var qi = 0
            while (qi < qs.length) {
              val s = TextFunctions.cosineArrays(qs(qi), ne)
              if (s > bestS(qi) || (s == bestS(qi) && nid < bestId(qi))) {
                bestS(qi) = s; bestId(qi) = nid
              }
              qi += 1
            }
          }
          if (!any) Iterator.empty
          else Iterator.tabulate(qs.length)(qi => (qids(qi), bestId(qi), bestS(qi)))
        }.toDF("query_id", "neighbor_id", "s")
      top1(partials, "bf_top1")
    }

    // equivalence
    val oldRows = bfOld(probes, emb).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val newRows = bfNew(probes, emb).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    println(s"R6S2 bf_equal=${oldRows.sameElements(newRows)} n=${oldRows.length}")

    timeIt("bf_old")(noop(bfOld(probes, emb)))
    timeIt("bf_new")(noop(bfNew(probes, emb)))

    // ---- fused synth+simhash ----
    val fusedUdf = udf((srcId: Long, variant: Int) => {
      import graft.sketch.core.XxHash64
      val acc = new Array[Int](64)
      var j = 0
      while (j < TextFunctions.SynthTokens) {
        val seed = if (variant != 0 && j < TextFunctions.SynthReplaced) 0xa17e7ea7L else 0x70cea7L
        val tok = java.lang.Long.toHexString(XxHash64.hashLong(srcId * 1000003L + j, seed))
        val h = XxHash64.hash(tok, 0x51a9b1e3c7d5f021L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
        j += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
      out
    })

    val ids = spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
    val shOld = ids
      .select(col("doc_id").as("id"), tfns.synthDocUdf(col("doc_id"), lit(0)).as("text"))
      .select(col("id"), tfns.simhashUdf(col("text")).as("sh"))
    val shNew = ids.select(col("doc_id").as("id"), fusedUdf(col("doc_id"), lit(0)).as("sh"))
    val a = shOld.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b2 = shNew.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    println(s"R6S2 simhash_equal=${a.sameElements(b2)} n=${a.length}")
    timeIt("simhash_old")(noop(shOld))
    timeIt("simhash_new")(noop(shNew))

    // ---- kll query: where does the time beyond the agg go? ----
    val exactFns = graft.sketch.agg.SketchFunctions(
      graft.sketch.agg.SketchConfig(kllK = 32768, tdigestCentroids = 32768))
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    def kllAggOnly(): DataFrame =
      ev.groupBy(col("event_type")).agg(exactFns.kllAgg(col("value")).as("sk"))
    def kllNoSort(): DataFrame = kllAggOnly()
      .select(col("event_type"),
        exactFns.kllQuantile(col("sk"), lit(0.25)).as("p25"),
        exactFns.kllQuantile(col("sk"), lit(0.5)).as("p50"),
        exactFns.kllQuantile(col("sk"), lit(0.75)).as("p75"),
        exactFns.kllQuantile(col("sk"), lit(0.99)).as("p99"))
    timeIt("kll_agg_collect")(kllAggOnly().collect())
    timeIt("kll_nosort_collect")(kllNoSort().collect())
    timeIt("kll_sorted_collect")(kllNoSort().orderBy("event_type").collect())

    spark.stop()
  }
}
