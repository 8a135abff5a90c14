package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6: where do the staged streaming replays spend time — per-batch
  * durations from StreamingQueryProgress, plus the batch pre-checks.
  */
object R6Scratch9 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch9")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val batchLog = new scala.collection.mutable.ArrayBuffer[String]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batchLog += s"batch=${p.batchId} rows=${p.numInputRows} " +
          s"durTotal=${p.batchDuration} durs=${p.durationMs}"
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    Seq("q_stream_dedup", "q_stream_flush", "q_stream_sessions").foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(spark, sfDir).collect() // warmup (stages + memoizes)
      batchLog.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val el = (System.nanoTime() - t0) / 1e9
      println(f"R6S9 $name total=${el}%.3fs")
      batchLog.foreach(l => println(s"R6S9 $name $l"))
    }
    spark.stop()
  }
}
