package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.jobs.SketchJob

/** Perf probe for the SketchJob deliverable: repeated timed runs at given
  * parallelism levels over the cached bench transcripts table, printing
  * turns/sec per run. Usage:
  *   sbt "runMain graft.tools.JobProbe <inputPath> <cores>[,<cores>...] [reps]"
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val input = if (args.length > 0) args(0) else "/root/repo/data/transcripts-c12000000"
    val levels = (if (args.length > 1) args(1) else "16,32").split(",").map(_.toInt)
    val reps = if (args.length > 2) args(2).toInt else 3

    levels.foreach { cores =>
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"job-probe-$cores")
        .config("spark.sql.shuffle.partitions", 2 * cores)
        .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
        .config("spark.sql.files.openCostInBytes", s"${4 * 1024 * 1024}")
        .config("spark.ui.enabled", "false")
        .config("spark.kryo.registrator", "graft.sketch.agg.GraftKryoRegistrator")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        (1 to reps).foreach { r =>
          val base = s"/root/repo/data/probe-job-$cores"
          def rm(): Unit = {
            val d = new java.io.File(base)
            if (d.exists()) java.nio.file.Files.walk(d.toPath)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => f.toFile.delete())
          }
          rm()
          System.gc(); Thread.sleep(300)
          val cfg = SketchJob.Config(input = input, output = s"$base/out",
            checkpointDir = s"$base/ckpt", checkpointChunks = 64,
            cmsWidth = 8192, cmsDepth = 5) // match Bench's job config
          val t0 = System.nanoTime()
          val res = SketchJob.run(spark, cfg)
          val n = res.agg(coalesce(sum(col("turns")), lit(0L))).collect()(0).getLong(0)
          val sec = (System.nanoTime() - t0) / 1e9
          val metrics = try {
            new String(java.nio.file.Files.readAllBytes(
              java.nio.file.Paths.get(s"$base/out/_metrics.json")), "UTF-8")
          } catch { case _: Exception => "{}" }
          println(f"PROBE cores=$cores rep=$r turns=$n sec=$sec%.2f " +
            f"thr=${n / sec / 1e6}%.2fM/s metrics=$metrics")
          rm()
        }
      } finally spark.stop()
    }
  }
}
