package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6: stage-by-stage timing of prefixJaccardCandidates (the shared
  * candidate generator of q_ngram_jaccard_near_dup / q_neardup_components /
  * q_corpus_curation).
  */
object R6Scratch4 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch4")
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
      println(f"R6S4 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
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
    val buckets = prefixes.groupBy(col("g"))
      .agg(tfns.cappedIdsAgg(LshBucketCap)(col("xid")).as("ids"))
      .filter(size(col("ids")).between(2, LshBucketCap))
    val hits = buckets
      .repartition(fanout)
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a"), explode(filter(col("ids"), x => x > col("a"))).as("b"))
    val cands = hits
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= PrefixGateK ||
        (col("a") % 2 === 1 && col("b") % 2 === 1))
      .select(expr("a DIV 2").as("doc_a"), expr("b DIV 2").as("doc_b"))

    println("R6S4 sets_rows=" + sets.count())
    println("R6S4 dfreq_rows=" + dfreq.count())
    println("R6S4 prefixes_rows=" + prefixes.count())
    println("R6S4 buckets_rows=" + buckets.count())
    println("R6S4 hits_rows=" + hits.count())
    println("R6S4 cands_rows=" + cands.count())
    val occ = buckets.select(size(col("ids")).as("n"))
      .agg(sum(col("n")), max(col("n")), sum(col("n") * (col("n") - 1) / 2)).collect()(0)
    println(s"R6S4 occupants_sum=${occ.get(0)} max=${occ.get(1)} pairs_sum=${occ.get(2)}")

    timeIt("sets")(noop(sets))
    timeIt("dfreq")(noop(dfreq))
    timeIt("prefixes")(noop(prefixes))
    timeIt("buckets")(noop(buckets))
    timeIt("hits")(noop(hits))
    timeIt("cands")(noop(cands))
    timeIt("q_ngram_full")(
      graft.SparkEntry.queries("q_ngram_jaccard_near_dup")(spark, sfDir).collect())
    spark.stop()
  }
}
