package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 2-minute box-health probe: scan-only throughput (zero user code) at
  * local[2] vs local[8] over the cached bench table. Clean box ⇒ 2→8
  * efficiency ≈ 0.79–0.99; a shared host (invisible to this VM: load avg
  * ~0, no local process, yet every column drops ~30%) shows up as ≤ ~0.75.
  * Run standalone before committing to a full Bench, and called by
  * [[graft.Bench]] itself as the pre-flight gate (the bench waits for a
  * clean window instead of burning 20 minutes measuring the co-tenant).
  */
object BoxProbe {

  /** Clean-box floor for the scan-only 2→8 ratio, from the round-3
    * repeated-run table (clean 0.79–0.99, contaminated ≤ 0.75).
    */
  val CleanThreshold2to8 = 0.78

  /** Measure the scan-only pair on `path`. Returns
    * (sec at local[2], sec at local[8], 2→8 efficiency).
    */
  def gauge(path: String): (Double, Double, Double) = {
    def scanAt(cores: Int): Double = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .appName(s"box-probe-$cores")
        .config("spark.sql.shuffle.partitions", 2 * cores)
        .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try {
        def scan(): Long = s.read.parquet(path)
          .select(col("conv_id").cast("binary").as("c"), col("role"),
            col("tool").cast("binary").as("t"), col("text_len"))
          // coalesce over the sum: an empty input path yields 0 with a
          // sensible downstream error instead of an opaque NPE on getLong
          .select(coalesce(sum(length(col("c")) + length(col("role"))
            + coalesce(length(col("t")), lit(0)) + col("text_len")), lit(0L)))
          .collect()(0).getLong(0)
        scan() // warmup
        val times = (1 to 2).map { _ =>
          System.gc(); Thread.sleep(200)
          val t0 = System.nanoTime(); scan(); (System.nanoTime() - t0) / 1e9
        }
        times.min
      } finally s.stop()
    }
    val t2 = scanAt(2)
    val t8 = scanAt(8)
    (t2, t8, (t2 / t8) / 4.0)
  }

  def main(args: Array[String]): Unit = {
    val path = sys.env.getOrElse("SPARK_GRAFT_BENCH_TABLE",
      "/root/repo/data/transcripts-c12000000")
    val (t2, t8, eff) = gauge(path)
    println(f"""{"probe_scan_sec_local2":$t2%.2f,"probe_scan_sec_local8":$t8%.2f,"probe_scan_2_to_8":$eff%.4f,"clean":${eff >= CleanThreshold2to8}}""")
  }
}
