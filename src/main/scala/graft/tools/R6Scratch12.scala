package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6: q_neardup_components decomposition — candidates vs verify vs CC. */
object R6Scratch12 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch12")
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
      println(f"R6S12 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    def pairs() = graft.SparkEntry.testPrefixJaccardCandidates(docs)
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .filter(tfns.exactJaccardUdf(col("ta"), col("tb")) >= 0.8)
      .select(col("doc_a"), col("doc_b"))
    timeIt("cands_only")(noop(graft.SparkEntry.testPrefixJaccardCandidates(docs)))
    timeIt("pairs_verified")(noop(pairs()))
    timeIt("cc_on_pipeline")(noop(graft.text.ConnectedComponents.run(pairs())))
    // CC on a materialized pair set (isolates the loop)
    val mat = pairs().collect().map(r => (r.getLong(0), r.getLong(1)))
    import spark.implicits._
    val matDf = spark.createDataset(mat.toSeq).toDF("doc_a", "doc_b")
    timeIt("cc_on_materialized")(noop(graft.text.ConnectedComponents.run(matDf)))
    val (_, rounds) = graft.text.ConnectedComponents.runWithRounds(matDf)
    println(s"R6S12 rounds=$rounds edges=${mat.length}")
    spark.stop()
  }
}
