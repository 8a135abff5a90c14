package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 batch 4: stage-by-stage timing of the CURRENT (framed-bucket)
  * prefixJaccardCandidates shape, mirroring SparkEntry exactly.
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
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val prefixes = sets.join(dfreq, "g")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - expr("(4*sz+4) DIV 5") + PrefixGateK)
      .select((col("doc_id") * 2 + when(col("sz") <= 14, 1L).otherwise(0L)).as("xid"),
        col("g"))
    val docPrefix = prefixes.groupBy(col("xid"))
      .agg(sort_array(collect_list(col("g"))).as("pg"))
    val bucketRows = docPrefix.select(col("xid"), col("pg"), explode(col("pg")).as("g"))
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

    println("R6S7 prefixes_rows=" + prefixes.count())
    println("R6S7 bucket_rows=" + bucketRows.count())
    val occ = buckets.select((size(col("occ")) - lit(1)).as("flatlen"))
    println("R6S7 buckets=" + buckets.count())
    val pr = bucketRows.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * (col("n") - 1) / 2), max(col("n"))).collect()(0)
    println(s"R6S7 pairs_scanned=${pr.get(0)} max_occ=${pr.get(1)}")
    println("R6S7 gated_rows=" + gated.count())

    timeIt("s1_sets")(noop(sets))
    timeIt("s2_dfreq")(noop(dfreq))
    timeIt("s3_prefixes_window")(noop(prefixes))
    timeIt("s4_docPrefix")(noop(docPrefix))
    timeIt("s5_buckets_agg")(noop(buckets))
    timeIt("s6_gated_pairs")(noop(gated))
    timeIt("s7_cands_distinct")(noop(cands))
    spark.stop()
  }
}
