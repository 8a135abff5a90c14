package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6: split planning vs execution cost; coalesce(1)-orderBy effect. */
object R6Scratch3 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch3")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timeIt(label: String)(f: => Unit): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R6S3 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val exactFns = graft.sketch.agg.SketchFunctions(
      graft.sketch.agg.SketchConfig(kllK = 32768, tdigestCentroids = 32768))
    val fns = graft.sketch.agg.SketchFunctions.default
    val ev = spark.read.parquet(s"$sfDir/events.parquet")

    def kllNoSort(): DataFrame =
      ev.groupBy(col("event_type")).agg(exactFns.kllAgg(col("value")).as("sk"))
        .select(col("event_type"),
          exactFns.kllQuantile(col("sk"), lit(0.25)).as("p25"),
          exactFns.kllQuantile(col("sk"), lit(0.5)).as("p50"),
          exactFns.kllQuantile(col("sk"), lit(0.75)).as("p75"),
          exactFns.kllQuantile(col("sk"), lit(0.99)).as("p99"))

    // planning vs execution: prebuilt DataFrame (plan object reused) vs fresh
    val prebuiltNoSort = kllNoSort()
    val prebuiltSorted = kllNoSort().orderBy("event_type")
    val prebuiltCoalesced = kllNoSort().coalesce(1).orderBy("event_type")
    timeIt("kll_nosort_prebuilt")(prebuiltNoSort.collect())
    timeIt("kll_nosort_fresh")(kllNoSort().collect())
    timeIt("kll_sorted_prebuilt")(prebuiltSorted.collect())
    timeIt("kll_sorted_fresh")(kllNoSort().orderBy("event_type").collect())
    timeIt("kll_coalesce1_prebuilt")(prebuiltCoalesced.collect())
    timeIt("kll_coalesce1_fresh")(kllNoSort().coalesce(1).orderBy("event_type").collect())

    // rows equal?
    val a = kllNoSort().orderBy("event_type").collect().toSeq
    val b = kllNoSort().coalesce(1).orderBy("event_type").collect().toSeq
    println(s"R6S3 coalesce_rows_equal=${a == b}")
    println("R6S3 sorted_plan:\n" + prebuiltSorted.queryExecution.executedPlan.toString.take(1200))
    println("R6S3 coalesced_plan:\n" + prebuiltCoalesced.queryExecution.executedPlan.toString.take(1200))

    // cms: two scans vs one
    def cmsOld(): DataFrame = {
      val sk = ev.agg(fns.cmsAgg(col("event_type")).as("sk"))
      ev.select(col("event_type")).distinct()
        .crossJoin(sk)
        .select(col("event_type"), fns.cmsQuery(col("sk"), col("event_type")).as("cnt"))
        .orderBy("event_type")
    }
    def cmsNew(): DataFrame = {
      ev.agg(fns.cmsAgg(col("event_type")).as("sk"),
          sort_array(collect_set(col("event_type"))).as("types"))
        .select(explode(col("types")).as("event_type"), col("sk"))
        .select(col("event_type"), fns.cmsQuery(col("sk"), col("event_type")).as("cnt"))
        .coalesce(1).orderBy("event_type")
    }
    timeIt("cms_old_fresh")(cmsOld().collect())
    timeIt("cms_new_fresh")(cmsNew().collect())
    val ca = cmsOld().collect().toSeq
    val cb = cmsNew().collect().toSeq
    println(s"R6S3 cms_rows_equal=${ca == cb}")

    // salted agg: fresh timing breakdown
    timeIt("salted_fresh")(graft.SparkEntry.queries("q_salted_agg")(spark, sfDir).collect())

    spark.stop()
  }
}
