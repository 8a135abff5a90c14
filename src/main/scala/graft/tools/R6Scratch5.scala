package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6: alternative pair-hit counting strategies for the prefix join. */
object R6Scratch5 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch5")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tfns = graft.text.TextSqlFunctions.default
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def timeIt(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R6S5 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val PrefixGateK = 12
    val LshBucketCap = 1024
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val sets = docs
      .select(col("doc_id"), tfns.shingleHashesUdf(col("text")).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("sz"),
        explode(col("gs")).as("g"))
    val dfreq = sets.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val prefixes = sets.join(dfreq, "g")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - expr("(4*sz+4) DIV 5") + PrefixGateK)
      .select((col("doc_id") * 2 + when(col("sz") <= 14, 1L).otherwise(0L)).as("xid"),
        col("g"))
    val fanout = spark.sessionState.conf.numShufflePartitions * 8
    def buckets() = prefixes.groupBy(col("g"))
      .agg(tfns.cappedIdsAgg(LshBucketCap)(col("xid")).as("ids"))
      .filter(size(col("ids")).between(2, LshBucketCap))
    def hits() = buckets()
      .repartition(fanout)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(filter(col("ids"), x => x > col("a"))).as("b"))

    // current: two-phase hash agg
    def candsCur() = hits()
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= PrefixGateK ||
        (col("a") % 2 === 1 && col("b") % 2 === 1))
      .select(expr("a DIV 2").as("doc_a"), expr("b DIV 2").as("doc_b"))

    // (a) pre-shuffle by (a,b): complete agg after exchange (no partial maps)
    def candsRepart() = hits()
      .repartition(col("a"), col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= PrefixGateK ||
        (col("a") % 2 === 1 && col("b") % 2 === 1))
      .select(expr("a DIV 2").as("doc_a"), expr("b DIV 2").as("doc_b"))

    // (b) sort + linear run-count (no hash maps at all)
    def candsSort() = {
      val sess = spark
      import sess.implicits._
      hits()
        .repartition(col("a"), col("b"))
        .sortWithinPartitions(col("a"), col("b"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          new Iterator[(Long, Long)] {
            var nextPair: (Long, Long) = null
            var cur: (Long, Long) = if (it.hasNext) it.next() else null
            def advance(): Unit = {
              nextPair = null
              while (nextPair == null && cur != null) {
                val (a, b) = cur
                var n = 1L
                var nx: (Long, Long) = null
                var done = false
                while (!done && it.hasNext) {
                  val p = it.next()
                  if (p._1 == a && p._2 == b) n += 1
                  else { nx = p; done = true }
                }
                if (n >= PrefixGateK || ((a & 1L) == 1L && (b & 1L) == 1L))
                  nextPair = (a / 2, b / 2)
                cur = nx
                if (!done && !it.hasNext && nx == null) cur = null
              }
            }
            advance()
            def hasNext: Boolean = nextPair != null
            def next(): (Long, Long) = { val r = nextPair; advance(); r }
          }
        }.toDF("doc_a", "doc_b")
    }

    // new shape: framed prefix arrays carried into buckets, local intersect
    def candsNew() = {
      val docPrefix = prefixes.groupBy(col("xid"))
        .agg(sort_array(collect_list(col("g"))).as("pg"))
      val bucketRows = docPrefix.select(col("xid"), col("pg"), explode(col("pg")).as("g"))
      bucketRows.groupBy(col("g"))
        .agg(tfns.cappedPrefixAgg(LshBucketCap)(col("xid"), col("pg")).as("occ"))
        .repartition(fanout)
        .select(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ")).as("fp"))
        .filter(size(col("fp")) > 0)
        .select(explode(expr(
          "transform(sequence(0, size(fp) DIV 2 - 1), " +
            "i -> struct(fp[i*2] AS a, fp[i*2+1] AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .distinct()
        .select(expr("a DIV 2").as("doc_a"), expr("b DIV 2").as("doc_b"))
    }

    val base = candsCur().collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rn = candsNew().collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    println(s"R6S5 equal_new=${base == rn} n=${base.size} n_new=${rn.size}")

    timeIt("cands_current")(noop(candsCur()))
    timeIt("cands_new")(noop(candsNew()))
    // isolate: framed bucket agg alone
    def framedBuckets() = {
      val docPrefix = prefixes.groupBy(col("xid"))
        .agg(sort_array(collect_list(col("g"))).as("pg"))
      docPrefix.select(col("xid"), col("pg"), explode(col("pg")).as("g"))
        .groupBy(col("g"))
        .agg(tfns.cappedPrefixAgg(LshBucketCap)(col("xid"), col("pg")).as("occ"))
    }
    timeIt("framed_buckets_only")(noop(framedBuckets()))
    // isolate: pair scan without explode/distinct (count only)
    val emitted = framedBuckets().repartition(fanout)
      .select(size(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ"))).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    println(s"R6S5 emitted_slots=$emitted pairs=${emitted / 2}")
    timeIt("pair_scan_only")(noop(
      framedBuckets().repartition(fanout)
        .select(size(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ"))).as("n"))
        .agg(sum(col("n")))))
    def fpRows() = framedBuckets().repartition(fanout)
      .select(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ")).as("fp"))
      .filter(size(col("fp")) > 0)
    timeIt("fp_rows_only")(noop(fpRows()))
    def explodedPairs() = fpRows()
      .select(explode(expr(
        "transform(sequence(0, size(fp) DIV 2 - 1), " +
          "i -> struct(fp[i*2] AS a, fp[i*2+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    timeIt("exploded_nodist")(noop(explodedPairs()))
    timeIt("exploded_dist")(noop(explodedPairs().distinct()))
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages.put(si.stageId,
          (si.name.take(60), si.taskMetrics.executorRunTime, si.numTasks))
      }
    })
    stages.clear()
    val t0 = System.nanoTime()
    explodedPairs().distinct().write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"R6S5 dist_run wall=$wall%.3f")
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(-_._2._2).take(12).foreach { case (id, (n, rt, nt)) =>
      println(f"R6S5 STAGE $id%4d runtime=${rt / 1000.0}%8.2fs tasks=$nt%4d $n")
    }
    timeIt("q_ngram_full_new")(
      graft.SparkEntry.queries("q_ngram_jaccard_near_dup")(spark, sfDir).collect())
    timeIt("q_neardup_components_new")(
      graft.SparkEntry.queries("q_neardup_components")(spark, sfDir).collect())
    timeIt("q_corpus_curation_new")(
      graft.SparkEntry.queries("q_corpus_curation")(spark, sfDir).collect())
    spark.stop()
  }
}
