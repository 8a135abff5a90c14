package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6: does materializing q_corpus_curation's survivor set (the
  * profile+dedup subtree, referenced ~6x by the funnel branches) beat the
  * documented recompute-is-cheaper call at verify scale, now that the
  * candidate generator is 5x faster?
  */
object R6Scratch14 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch14")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tfns = graft.text.TextSqlFunctions.default
    def timeIt(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R6S14 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    timeIt("corpus_current")(
      graft.SparkEntry.queries("q_corpus_curation")(spark, sfDir).collect())

    def corpusCkpt(): DataFrame = {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val prof = docs.select(
        col("doc_id"), col("text"),
        tfns.tokenCountCol(col("text")).cast("long").as("tokens"),
        tfns.fingerprintUdf(col("text")).as("fp"),
        tfns.qualityScoreUdf(col("text")).as("quality"),
        tfns.langIdUdf(col("text")).as("lang"))
      val langOk = col("lang").isin("en", "pt")
      val qOk = langOk && col("quality") >= 0.85
      val head = prof.agg(
        count(lit(1)).as("docs_total"),
        count(when(langOk, 1)).as("lang_kept"),
        count(when(qOk, 1)).as("quality_kept"))
      val surv = prof.filter(qOk)
        .groupBy(col("fp"))
        .agg(min_by(struct(col("doc_id"), col("text"), col("tokens")),
          col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
          col("r.tokens").as("tokens"))
        .localCheckpoint(true)
      val removal = graft.SparkEntry
        .testPrefixJaccardCandidates(surv.select(col("doc_id"), col("text")))
        .join(surv.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
        .join(surv.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
        .filter(tfns.exactJaccardUdf(col("ta"), col("tb")) >= 0.8)
        .select(col("doc_b").as("doc_id")).distinct()
      val fin = surv.join(removal, Seq("doc_id"), "left_anti")
      val exactKept = surv.agg(count(lit(1)).as("exact_kept"))
      val tail = fin.agg(
        count(lit(1)).as("neardup_kept"),
        sum(col("tokens")).as("tokens_kept"))
      head.crossJoin(exactKept).crossJoin(tail)
    }
    timeIt("corpus_surv_ckpt")(corpusCkpt().collect())
    // result parity
    val a = graft.SparkEntry.queries("q_corpus_curation")(spark, sfDir).collect().toSeq
    val b = corpusCkpt().collect().toSeq
    println(s"R6S14 parity=${a.toString == b.toString} a=$a b=$b")
    spark.stop()
  }
}
