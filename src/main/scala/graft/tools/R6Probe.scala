package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-6 optimization probe: times SparkEntry queries in a session
  * configured EXACTLY like graft.Bench's per-query session (local[32],
  * shuffle.partitions=64, 128 MB splits), warmup + best of 3, and
  * optionally dumps `.explain("formatted")` to plans/r06/<q>_<tag>.txt.
  *
  * Usage:
  *   sbt "runMain graft.tools.R6Probe <sfDir> <q1,q2,...|headline|all> [plantag]"
  */
object R6Probe {
  private val Headline = Seq(
    "q_cms_event_counts", "q_hll_users_per_nation", "q_topk_event_types",
    "q_tdigest_value_quantiles", "q_kll_value_quantiles",
    "q_latency_quantiles", "q_salted_agg", "q_dedup_exact",
    "q_minhash_near_dup", "q_simhash_near_dup", "q_embed_near_dup",
    "q_ann_lsh_recall", "q_ann_ivf_recall")

  // queries whose fn() executes eagerly (streaming / multi-batch): the
  // "plan" of the returned frame is a sink scan, so skip plan dumps
  private val Eager = Set("q_stream_windowed_sketches", "q_stream_sessions",
    "q_stream_restart", "q_stream_flush", "q_stream_dedup",
    "q_stream_dedup_bounded", "q_ann_ivf_index")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val sel = if (args.length > 1) args(1) else "headline"
    val planTag = if (args.length > 2) Some(args(2)) else None
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names: Seq[String] = sel match {
      case "headline" => Headline
      case "all" => graft.SparkEntry.queries.keys.toSeq.sorted
      case s => s.split(",").toSeq
    }
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("r6-probe")
      .config("spark.sql.shuffle.partitions", math.max(cores, 2 * cores))
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.kryo.registrator", "graft.sketch.agg.GraftKryoRegistrator")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, (Int, Seq[Double])]
    try {
      names.foreach { name =>
        val fn = graft.SparkEntry.queries(name)
        spark.sparkContext.setJobDescription(s"r6probe: $name warmup")
        fn(spark, sfDir).collect() // warmup: codegen + first planning
        val times = (1 to 3).map { i =>
          System.gc(); Thread.sleep(300)
          spark.sparkContext.setJobDescription(s"r6probe: $name run$i")
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).collect().length
          (n, (System.nanoTime() - t0) / 1e9)
        }
        results(name) = (times.head._1, times.map(_._2))
        println(f"R6PROBE $name rows=${times.head._1} best=${times.map(_._2).min}%.3fs " +
          f"all=${times.map(t => f"${t._2}%.3f").mkString(",")}")
        planTag.foreach { tag =>
          if (!Eager.contains(name)) {
            val txt = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            val dir = java.nio.file.Paths.get("/root/repo/plans/r06")
            java.nio.file.Files.createDirectories(dir)
            java.nio.file.Files.writeString(dir.resolve(s"${name}_$tag.txt"), txt)
          }
        }
      }
      val total = results.values.map(_._2.min).sum
      println(f"R6PROBE TOTAL best-sum=${total}%.3fs over ${results.size} queries")
    } finally spark.stop()
  }
}
