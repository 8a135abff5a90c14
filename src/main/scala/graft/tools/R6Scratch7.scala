package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 batch 5: stage-by-stage timing of the batch-4 (fused build,
  * short-prefix buckets, primitive buffers) prefixJaccardCandidates shape.
  */
object R6Scratch7 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch7")
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
      println(f"R6S7 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
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
    val buckets = bucketRows.groupBy(col("g"))
      .agg(tfns.cappedPrefixAgg(LshBucketCap)(col("xid"), col("pg")).as("occ"))
    val gated = buckets
      .repartition(fanout)
      .select(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ")).as("fp"))
      .filter(size(col("fp")) > 0)
      .select(explode(expr(
        "transform(sequence(0, size(fp) DIV 2 - 1), " +
          "i -> struct(fp[i*2] AS a, fp[i*2+1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cands = gated.distinct()
      .select(expr("a DIV 2").as("doc_a"), expr("b DIV 2").as("doc_b"))

    println("R6S7 gated_rows=" + gated.count())
    timeIt("s5_gated_pairs")(noop(gated))
    timeIt("s6_cands_distinct")(noop(cands))
    // variants to isolate the distinct cost
    timeIt("v1_packed_key_distinct")(noop(
      gated.select((shiftleft(col("a"), 32) + col("b")).as("pk")).distinct()))
    timeIt("v2_groupby_count")(noop(gated.groupBy(col("a"), col("b")).count()))
    timeIt("v3_no_fanout_distinct")(noop(
      buckets
        .select(tfns.prefixPairsUdf(LshBucketCap, PrefixGateK)(col("occ")).as("fp"))
        .filter(size(col("fp")) > 0)
        .select(explode(expr(
          "transform(sequence(0, size(fp) DIV 2 - 1), " +
            "i -> struct(fp[i*2] AS a, fp[i*2+1] AS b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b")).distinct()))
    ()
    spark.stop()
  }
}
