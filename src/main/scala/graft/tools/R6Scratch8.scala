package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 4 prototype: reworked prefixJaccardCandidates —
  *  (a) window + docPrefix fused into ONE groupBy(doc_id) with
  *      sort_array(collect_list(struct(df, g))) + slice (pure built-ins,
  *      one shuffle less, no per-doc sort exchange);
  *  (b) buckets built over the SHORT 1-prefix (sz − ceil(0.8 sz) + 1; the
  *      j = 1 case of the prefix-filter lemma: the MIN common token of any
  *      true pair lies in both docs' 1-prefixes), carrying the full
  *      K-prefix array for the count gate — fewer bucket rows, quadratically
  *      fewer in-bucket pair merges;
  * Validates candidate-set equality vs the shipped generator and times both.
  */
object R6Scratch8 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch8")
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
      println(f"R6S8 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val PrefixGateK = 12
    val LshBucketCap = 1024
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // ---- new shape ----
    val sets = docs
      .select(col("doc_id"), tfns.shingleHashesUdf(col("text")).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("sz"),
        explode(col("gs")).as("g"))
    val dfreq = sets.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val docPrefix = sets.join(dfreq, "g")
      .groupBy(col("doc_id"), col("sz"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("toks"))
      .select(
        (col("doc_id") * 2 + when(col("sz") <= 14, 1L).otherwise(0L)).as("xid"),
        sort_array(expr("transform(slice(toks, 1, CAST(sz - (4*sz+4) DIV 5 + " +
          s"$PrefixGateK AS INT)), x -> x.g)")).as("pg"),
        sort_array(expr("transform(slice(toks, 1, CAST(sz - (4*sz+4) DIV 5 + 1 AS INT)), " +
          "x -> x.g)")).as("ps"))
    val bucketRows = docPrefix.select(col("xid"), col("pg"), explode(col("ps")).as("g"))
    val fanout = spark.sessionState.conf.numShufflePartitions * 8
    val gated = bucketRows.groupBy(col("g"))
      .agg(tfns.cappedPrefixAgg(LshBucketCap)(col("xid"), col("pg")).as("occ"))
      .repartition(fanout)
      .select(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ")).as("fp"))
      .filter(size(col("fp")) > 0)
      .select(explode(expr(
        "transform(sequence(0, size(fp) DIV 2 - 1), " +
          "i -> struct(fp[i*2] AS a, fp[i*2+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val candsNew = gated.distinct()
      .select(expr("a DIV 2").as("doc_a"), expr("b DIV 2").as("doc_b"))

    // stats
    println("R6S8 bucket_rows_new=" + bucketRows.count())
    val pr = bucketRows.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2), max(col("n")), count(lit(1))).collect()(0)
    println(s"R6S8 pairs_scanned_new=${pr.get(0)} max_occ=${pr.get(1)} buckets=${pr.get(2)}")
    val dpg = docPrefix.select(countDistinct(col("pg")), countDistinct(col("ps")),
      count(lit(1))).collect()(0)
    println(s"R6S8 distinct_pg=${dpg.get(0)} distinct_ps=${dpg.get(1)} docs=${dpg.get(2)}")

    // candidate-set equality vs shipped generator
    val candsOld = graft.SparkEntry.testPrefixJaccardCandidates(docs)
    val oldSet = candsOld.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val newSet = candsNew.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"R6S8 cands_old=${oldSet.size} cands_new=${newSet.size} " +
      s"new_minus_old=${(newSet -- oldSet).size} old_minus_new=${(oldSet -- newSet).size}")
    // recall safety: every old candidate that is a TRUE pair must be in new.
    // (new ⊆ old is expected: short-prefix buckets are a subset; gate identical)

    timeIt("cands_old")(noop(candsOld))
    timeIt("cands_new")(noop(candsNew))
    spark.stop()
  }
}
