package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6: per-action timing inside the CC loop on a tiny edge set. */
object R6Scratch13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch13")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(7L)
    val mat = (0 until 256).map(i => (rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
    val matDf = spark.createDataset(mat).toDF("a", "b")
    def tms[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"R6S13 $label ${(System.nanoTime() - t0) / 1e6}%.1fms"); r
    }
    // warmup whole thing once
    graft.text.ConnectedComponents.run(matDf).write.format("noop").mode("overwrite").save()
    (1 to 2).foreach { trial =>
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val e0 = tms(s"t$trial input_ckpt")(matDf
        .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
        .filter(col("hi") =!= col("lo")).distinct().localCheckpoint(true))
      tms(s"t$trial count")(e0.count())
      tms(s"t$trial fingerprint")(e0.agg(count(lit(1)),
        expr("bit_xor(xxhash64(hi, lo))")).head())
      var e = e0
      (1 to 2).foreach { r =>
        val sym = e.select(col("hi").as("u"), col("lo").as("v"))
          .union(e.select(col("lo").as("u"), col("hi").as("v")))
        val lmin = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
          .select(col("u"), least(col("mv"), col("u")).as("m"))
        val large = sym.join(lmin, "u").filter(col("v") > col("u"))
          .select(col("v").as("hi"), col("m").as("lo")).distinct()
        val smin = large.groupBy(col("hi")).agg(min(col("lo")).as("m"))
        val relinked = large.join(smin, "hi").filter(col("lo") > col("m"))
          .select(col("lo").as("hi"), col("m").as("lo"))
        val self = smin.select(col("hi"), col("m").as("lo"))
        val nextDf = relinked.union(self).distinct()
        tms(s"t$trial round$r plan")(nextDf.queryExecution.executedPlan)
        tms(s"t$trial round$r count_only")(nextDf.count())
        tms(s"t$trial round$r noop")(
          nextDf.write.format("noop").mode("overwrite").save())
        val next = tms(s"t$trial round$r ckpt")(nextDf.localCheckpoint(true))
        tms(s"t$trial round$r fp")(next.agg(count(lit(1)),
          expr("bit_xor(xxhash64(hi, lo))")).head())
        e = next
      }
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    spark.stop()
  }
}
