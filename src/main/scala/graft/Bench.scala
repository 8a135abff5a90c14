package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.jobs.TranscriptGen
import graft.sketch.agg.SketchFunctions

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Two measurements:
  *  1. per-query wall times of the SparkEntry operator queries at local[32]
  *     on SPARK_GRAFT_SF_DIR (the driver's contract);
  *  2. the north-rule metric: sketch-build throughput (turns/sec) of the
  *     flagship six-sketch aggregation over the synthetic transcripts table,
  *     run at TWO parallelism levels (local[8] vs local[32], same input, same
  *     JVM) — the sandbox stand-in for N→4N executors. Scaling efficiency =
  *     (thr32/thr8)/4, target ≥0.8 (BASELINE.md).
  *
  * Prints ONE JSON line; also refreshes BENCH.md with the scaling evidence.
  */
object Bench {

  private def fmt(d: Double): String = f"$d%.4f"

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", math.max(cores, 2 * cores))
      // bench-scale knob: data here is ~100s of MB, so split scans finer
      // than the 128MB default or most cores idle (at production scale the
      // default is right — files >> cores)
      .config("spark.sql.files.maxPartitionBytes", s"${16 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The flagship sketch-build: all six north-rule sketches per role in one
    * pass (map-side partial agg → 4-row shuffle → final merge).
    */
  private def sketchBuild(spark: SparkSession, path: String): Long = {
    val fns = SketchFunctions.default
    val df = spark.read.parquet(path)
      .select(col("conv_id"), col("role"), col("tool"),
        length(col("text")).cast("double").as("len"))
    val out = df.groupBy(col("role"))
      .agg(
        fns.hllAgg(col("conv_id")).as("hll"),
        fns.cmsAgg(col("tool")).as("cms"),
        fns.topkAgg(col("tool")).as("topk"),
        fns.tdigestAgg(col("len")).as("td"),
        fns.kllAgg(col("len")).as("kll"),
        fns.bloomAgg(col("conv_id")).as("bloom"),
        count(lit(1)).as("turns"))
    // collect the FULL rows (sketch bytes included): selecting only the
    // count would let Catalyst prune every sketch aggregate out of the plan
    // and benchmark a metadata-only count
    val rows = out.collect()
    require(rows.forall(_.getAs[Array[Byte]]("hll").nonEmpty))
    rows.map(_.getAs[Long]("turns")).sum
  }

  /** The SketchJob path (mapPartitions full map-side combine + per-partition
    * checkpoints) on a fresh checkpoint dir — the deliverable spark-submit
    * job's stage 1+2.
    */
  private def sketchJob(spark: SparkSession, path: String, tag: String): Long = {
    import graft.jobs.SketchJob
    val base = s"/root/repo/data/bench-job-$tag"
    def rm(p: String): Unit = {
      val d = new java.io.File(p)
      if (d.exists()) {
        java.nio.file.Files.walk(d.toPath)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => f.toFile.delete())
      }
    }
    rm(base)
    val cfg = SketchJob.Config(input = path, output = s"$base/out",
      checkpointDir = s"$base/ckpt", checkpointChunks = 64)
    val res = SketchJob.run(spark, cfg)
    val n = res.agg(sum(col("turns"))).collect()(0).getLong(0)
    rm(base)
    n
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val sf = sfDir.split("sf").last.toDoubleOption.getOrElse(0.1)
    // scaling table is sized so the measured job runs for >=10s at local[8]
    // (fixed ~0.3s scheduling overhead must not dominate the measurement);
    // generated once and cached under data/
    val benchConvs = sys.env.get("SPARK_GRAFT_BENCH_CONVS").map(_.toLong)
      .getOrElse(if (sf >= 0.1) 12000000L else math.max(2000L, (1500000 * sf).toLong))
    val dataDir = "/root/repo/data"
    val benchPath = s"$dataDir/transcripts-c$benchConvs"

    // ---- phase 1: driver-contract query timings at local[32] ----
    var queries = Map.empty[String, Double]
    var turns = 0L
    var thr32 = 0.0
    var jobThr32 = 0.0
    var jobThr8 = 0.0
    locally {
      val spark = session(32)
      try {
        TranscriptGen.ensure(spark, benchPath, benchConvs, hotConvs = 8,
          hotTurns = 20000, parallelism = 64)
        queries = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
          val (_, sec) = timed(fn(spark, sfDir).collect())
          name -> sec
        }.toMap
        // warmup (codegen + classloading) then measured run
        sketchBuild(spark, benchPath)
        val (n, sec) = timed(sketchBuild(spark, benchPath))
        turns = n
        thr32 = n / sec
        val (_, jsec) = timed(sketchJob(spark, benchPath, "32"))
        jobThr32 = turns / jsec
      } finally spark.stop()
    }

    // ---- phase 2: same job at quarter parallelism (N vs 4N evidence) ----
    var thr8 = 0.0
    locally {
      val spark = session(8)
      try {
        sketchBuild(spark, benchPath) // warmup
        val (n, sec) = timed(sketchBuild(spark, benchPath))
        thr8 = n / sec
        val (_, jsec) = timed(sketchJob(spark, benchPath, "8"))
        jobThr8 = turns / jsec
      } finally spark.stop()
    }

    val efficiency = (thr32 / thr8) / 4.0
    val jobEfficiency = (jobThr32 / jobThr8) / 4.0
    val qJson = queries.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = queries.values.sum
    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qJson,""" +
        s""""sf":"$sfDir","bench_turns":$turns,""" +
        s""""sketch_build":{"local8_turns_per_sec":${fmt(thr8)},""" +
        s""""local32_turns_per_sec":${fmt(thr32)},""" +
        s""""scaling_efficiency_8_to_32":${fmt(efficiency)}},""" +
        s""""sketch_job":{"local8_turns_per_sec":${fmt(jobThr8)},""" +
        s""""local32_turns_per_sec":${fmt(jobThr32)},""" +
        s""""scaling_efficiency_8_to_32":${fmt(jobEfficiency)}}}"""
    println(json)

    // refresh BENCH.md evidence file
    try {
      val md =
        s"""# BENCH — measured on this machine (local mode)
           |
           |North-rule metric: sketch-build throughput over the synthetic
           |transcripts table ($turns turns, $benchConvs convs, planted hot
           |conv_ids), flagship six-sketch aggregation per role
           |(HLL++ conv_id, CMS tool, Space-Saving top-k tool, t-digest
           |len(text), KLL len(text), Bloom conv_id).
           |
           || parallelism | UDAF path (turns/sec) | SketchJob path (turns/sec) |
           || --- | --- | --- |
           || local[8]  (N)  | ${fmt(thr8)} | ${fmt(jobThr8)} |
           || local[32] (4N) | ${fmt(thr32)} | ${fmt(jobThr32)} |
           |
           |**Scaling efficiency (N → 4N): UDAF ${fmt(efficiency)}, SketchJob
           |${fmt(jobEfficiency)}** (target ≥ 0.8, BASELINE.json north_rule;
           |evidenced as local[8] vs local[32] on the same input in this
           |single-machine sandbox).
           |
           |Per-query times (sf dir `$sfDir`): see BENCH_r{N}.json `queries`.
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/root/repo/BENCH.md"), md)
    } catch { case _: Throwable => () }
  }
}
