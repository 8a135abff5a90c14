package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-6: state-partition sweep for the staged sessionize replay. */
object R6Scratch10 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch10")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val stage = graft.SparkEntry.testStageEventsByTime(spark, sfDir, 4)
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    def run(parts: Int, tag: String): Unit = {
      (1 to 3).foreach { i =>
        val turns = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(stage)
          .withColumn("ts", col("ts").cast("timestamp"))
          .select(col("user_id").cast("string").as("conv_id"), lit("e").as("role"),
            col("value").cast("double").as("text_len"), col("ts"))
          .as[graft.streaming.TranscriptStream.TurnEvent]
        val sessions = graft.streaming.TranscriptStream.sessionize(turns, gapSeconds = 3600)
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        val t0 = System.nanoTime()
        val q =
          try {
            spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
            sessions.writeStream.format("memory").queryName(s"s10_${tag}_$i")
              .outputMode("append")
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .start()
          } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
        q.awaitTermination()
        val el = (System.nanoTime() - t0) / 1e9
        val n = spark.table(s"s10_${tag}_$i").count()
        println(f"R6S10 parts=$parts run$i ${el}%.3fs rows=$n")
        spark.sql(s"DROP TABLE IF EXISTS s10_${tag}_$i")
      }
    }
    run(8, "p8")
    run(4, "p4")
    run(2, "p2")
    run(8, "p8b")
    spark.stop()
  }
}
