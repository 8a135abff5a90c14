package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Round-6: A/B the CappedIdsAgg primitive-buffer encoder change at the
  * 1M-vector headroom scale (lsh_recall_18bit regressed 4.6 -> 24.8 s in
  * the full suite run — is it the agg or the box?).
  */
object R6Scratch15 {
  // the ORIGINAL kryo ArrayBuffer buffer shape, inlined for comparison
  final class KryoIdsAgg(cap: Int)
      extends Aggregator[java.lang.Long, scala.collection.mutable.ArrayBuffer[Long], Array[Long]] {
    def zero: scala.collection.mutable.ArrayBuffer[Long] =
      new scala.collection.mutable.ArrayBuffer[Long](8)
    def reduce(b: scala.collection.mutable.ArrayBuffer[Long], v: java.lang.Long)
        : scala.collection.mutable.ArrayBuffer[Long] = {
      if (b.length <= cap && v != null) b += v.longValue()
      b
    }
    def merge(a: scala.collection.mutable.ArrayBuffer[Long],
        b: scala.collection.mutable.ArrayBuffer[Long])
        : scala.collection.mutable.ArrayBuffer[Long] = {
      var i = 0
      while (a.length <= cap && i < b.length) { a += b(i); i += 1 }
      a
    }
    def finish(b: scala.collection.mutable.ArrayBuffer[Long]): Array[Long] = b.toArray
    def bufferEncoder: Encoder[scala.collection.mutable.ArrayBuffer[Long]] =
      Encoders.kryo[scala.collection.mutable.ArrayBuffer[Long]]
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tfns = graft.text.TextSqlFunctions.default
    val Cap = 1024
    val emb = spark.read.parquet("/root/repo/data/headroom/vec1m/embeddings.parquet")
    def timeIt(label: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R6S15 $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }
    val probes = broadcast(emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("query_id"),
        tfns.perturbUdf(col("embedding"), col("vec_id"), lit(0.15)).as("qe")))
    def lshCount(agg: org.apache.spark.sql.expressions.UserDefinedFunction): Long = {
      val rawBanded = emb.select(col("vec_id"),
        explode(tfns.annBucketsParamUdf(col("embedding"), lit(18), lit(12))).as("bucket"))
      val probeBanded = broadcast(probes.select(col("query_id"),
        explode(tfns.annBucketsParamUdf(col("qe"), lit(18), lit(12))).as("bucket")))
      val probeBuckets = broadcast(probeBanded.select(col("bucket")).distinct())
      rawBanded.join(probeBuckets, "bucket")
        .groupBy(col("bucket"))
        .agg(agg(col("vec_id")).as("ids"))
        .filter(size(col("ids")).between(1, Cap))
        .join(probeBanded, "bucket")
        .select(col("query_id"), explode(col("ids")).as("neighbor_id"))
        .distinct()
        .join(probes, "query_id")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")),
          "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
        .groupBy(col("query_id")).agg(max_by(col("neighbor_id"), col("s")).as("lsh_top1"))
        .filter(col("lsh_top1") === col("query_id")).count()
    }
    val kryoAgg = udaf(new KryoIdsAgg(Cap), Encoders.LONG)
    println("R6S15 warm new=" + lshCount(tfns.cappedIdsAgg(Cap)))
    println("R6S15 warm old=" + lshCount(kryoAgg))
    timeIt("lsh18_newagg")(lshCount(tfns.cappedIdsAgg(Cap)))
    timeIt("lsh18_kryoagg")(lshCount(kryoAgg))
    spark.stop()
  }
}
