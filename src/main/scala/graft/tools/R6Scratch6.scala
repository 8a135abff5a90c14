package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 batch 4: where does q_ngram_jaccard_near_dup's time go AFTER the
  * framed-bucket rework — candidate generation vs the exact-Jaccard verify
  * (which re-shingles both texts per candidate pair)?
  */
object R6Scratch6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch6")
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
      println(f"R6S6 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // corpus stats
    val st = docs.select(length(col("text")).as("l")).agg(
      count(lit(1)), avg(col("l")), max(col("l"))).collect()(0)
    println(s"R6S6 docs=${st.get(0)} avg_len=${st.get(1)} max_len=${st.get(2)}")

    val cands = graft.SparkEntry.testPrefixJaccardCandidates(docs)
    println("R6S6 cands_rows=" + cands.count())

    timeIt("candidates_only")(noop(cands))

    def verify(p: DataFrame) = p
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        tfns.exactJaccardOnceUdf(col("ta"), col("tb")).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    timeIt("cand_plus_verify")(noop(verify(cands)))
    timeIt("full_query")(
      graft.SparkEntry.queries("q_ngram_jaccard_near_dup")(spark, sfDir).collect())

    // verify-only over a materialized candidate table (isolates the verify)
    val candsM = cands.collect()
    import spark.implicits._
    val candsDf = spark.createDataset(candsM.map(r => (r.getLong(0), r.getLong(1)))).toDF("doc_a", "doc_b")
    timeIt("verify_only_materialized")(noop(verify(candsDf)))
    spark.stop()
  }
}
