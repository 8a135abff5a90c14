package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6: q_text_profile cost split — UDFs vs sort vs collect. */
object R6Scratch11 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch11")
      .config("spark.sql.shuffle.partitions", 64)
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
      println(f"R6S11 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val base = docs.select(col("doc_id"),
      length(col("text")).cast("long").as("chars"),
      tfns.tokenCountCol(col("text")).cast("long").as("tokens"),
      tfns.bpeishCountUdf(col("text")).cast("long").as("bpeish_tokens"),
      tfns.qualityScoreUdf(col("text")).as("quality"),
      tfns.langIdUdf(col("text")).as("lang_pred"))
    timeIt("profile_noop")(noop(base))
    timeIt("profile_sorted_noop")(noop(base.orderBy("doc_id")))
    timeIt("profile_sorted_collect")(base.orderBy("doc_id").collect())
    timeIt("bpeish_only")(noop(docs.select(tfns.bpeishCountUdf(col("text")))))
    timeIt("quality_only")(noop(docs.select(tfns.qualityScoreUdf(col("text")))))
    timeIt("langid_only")(noop(docs.select(tfns.langIdUdf(col("text")))))
    timeIt("tokencount_only")(noop(docs.select(tfns.tokenCountCol(col("text")))))
    timeIt("scan_only")(noop(docs))
    // sort first, project after: does the projection stay above the sort?
    val sortedFirst = docs.select(col("doc_id"), col("text")).orderBy("doc_id")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("chars"),
        tfns.tokenCountCol(col("text")).cast("long").as("tokens"),
        tfns.bpeishCountUdf(col("text")).cast("long").as("bpeish_tokens"),
        tfns.qualityScoreUdf(col("text")).as("quality"),
        tfns.langIdUdf(col("text")).as("lang_pred"))
    println("R6S11 sortedFirst plan:")
    println(sortedFirst.queryExecution.executedPlan.toString.take(1600))
    timeIt("profile_sortfirst_noop")(noop(sortedFirst))
    spark.stop()
  }
}
