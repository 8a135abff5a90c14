package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway sub-pipeline timings for round-6 optimization (guide §1.4:
  * noop-sink isolation). Not part of any deliverable measurement.
  */
object R6Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("r6-scratch")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", s"${128 * 1024 * 1024}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tfns = graft.text.TextSqlFunctions.default
    def t(s: SparkSession, dir: String, name: String): DataFrame =
      s.read.parquet(s"$dir/$name.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timeIt(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"R6SCRATCH $label best=${ts.min}%.3fs all=${ts.map(x => f"$x%.3f").mkString(",")}")
    }

    val emb = t(spark, sfDir, "embeddings")
    val probes = broadcast(emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("query_id"),
        tfns.perturbUdf(col("embedding"), col("vec_id"), lit(0.15)).as("qe")))

    // ---- ANN: brute-force gate in isolation ----
    def bfTop1(p: DataFrame, e: DataFrame): DataFrame =
      p.crossJoin(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")))
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
        .groupBy(col("query_id"))
        .agg(max_by(col("neighbor_id"), struct(col("s"), -col("neighbor_id"))).as("bf_top1"))
    timeIt("bfTop1_gate")(noop(bfTop1(probes, emb)))

    // probes materialization alone
    timeIt("probes_only")(noop(probes))

    // corpus banding pass alone (LSH)
    val rawBanded = emb.select(col("vec_id"),
      explode(tfns.annBucketsParamUdf(col("embedding"), lit(10), lit(12))).as("bucket"))
    timeIt("lsh_rawBanded")(noop(rawBanded))

    // full LSH candidate side (no gate)
    def lshCands(): DataFrame = {
      val probeBanded = broadcast(probes.select(col("query_id"),
        explode(tfns.annBucketsParamUdf(col("qe"), lit(10), lit(12))).as("bucket")))
      val probeBuckets = broadcast(probeBanded.select(col("bucket")).distinct())
      val candIds = rawBanded.join(probeBuckets, "bucket")
        .groupBy(col("bucket"))
        .agg(tfns.cappedIdsAgg(1024)(col("vec_id")).as("ids"))
        .filter(size(col("ids")).between(1, 1024))
        .join(probeBanded, "bucket")
        .select(col("query_id"), explode(col("ids")).as("neighbor_id"))
        .distinct()
      candIds.join(probes, "query_id")
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")),
          "neighbor_id")
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
        .groupBy(col("query_id"))
        .agg(max_by(col("neighbor_id"), struct(col("s"), -col("neighbor_id"))).as("lsh_top1"))
    }
    timeIt("lsh_cand_side")(noop(lshCands()))

    // ---- IVF: assign + cands side ----
    def ivfCands(): DataFrame = {
      val cents: Array[Array[Float]] = emb.filter(col("vec_id") < 64)
        .select(col("vec_id"), col("embedding")).collect()
        .sortBy(_.getLong(0))
        .map(_.getSeq[Float](1).toArray)
      val assignUdf = udf((v: Seq[Float]) => graft.text.VectorIvf.assign(v, cents))
      val probeCellsUdf =
        udf((v: Seq[Float]) => graft.text.VectorIvf.topClusters(v, cents, 8))
      val index = emb.select(col("vec_id").as("neighbor_id"),
        assignUdf(col("embedding")).as("cluster"), col("embedding").as("ne"))
      val probeCells = broadcast(probes.select(col("query_id"), col("qe"),
        explode(probeCellsUdf(col("qe"))).as("cluster")))
      probeCells.join(index, "cluster")
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
        .groupBy(col("query_id"))
        .agg(max_by(col("neighbor_id"), struct(col("s"), -col("neighbor_id"))).as("ivf_top1"),
          count(lit(1)).as("nc"))
    }
    timeIt("ivf_cand_side")(noop(ivfCands()))

    // ---- simhash: stagewise ----
    val ids = t(spark, sfDir, "documents").select(col("doc_id"))
    val originals = ids
      .select(col("doc_id").as("id"), tfns.synthDocUdf(col("doc_id"), lit(0)).as("text"))
    val dups = ids.filter(col("doc_id") < 40)
      .select((col("doc_id") + 1000000000L).as("id"),
        tfns.synthDocUdf(col("doc_id"), lit(1)).as("text"))
    val sh = originals.unionByName(dups)
      .select(col("id"), tfns.simhashUdf(col("text")).as("sh"))
    timeIt("simhash_fingerprints")(noop(sh))
    val bandKeys = array((0 until 8).map(b =>
      shiftrightunsigned(col("sh"), b * 8).bitwiseAND(lit(255L)) + lit(b * 256L)): _*)
    val banded = sh.select(col("id"), col("sh"), explode(bandKeys).as("band"))
    val shPairs = banded.groupBy(col("band"))
      .agg(tfns.cappedTaggedIdsAgg(1024)(col("id"), col("sh")).as("xs"))
      .filter((size(col("xs")) / 2).between(2, 1024))
      .select(explode(tfns.taggedPairsUdf(col("xs"))).as("p"))
      .filter(tfns.hammingCol(col("p.tag_a"), col("p.tag_b")) <= 7)
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    timeIt("simhash_full_nodist")(noop(shPairs))

    // ---- minhash: signature pass alone ----
    val docs = t(spark, sfDir, "documents").select(col("doc_id"), col("text"))
    val mbanded = docs
      .select(col("doc_id"), tfns.minhashSigUdf(col("text")).as("sig"))
      .select(col("doc_id"), explode(tfns.minhashBandsUdf(col("sig"))).as("band"))
    timeIt("minhash_banded")(noop(mbanded))

    // minhash bucket agg + pair expand + verify
    val mpairs = mbanded.groupBy(col("band"))
      .agg(tfns.cappedIdsAgg(1024)(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, 1024))
      .select(explode(tfns.idPairsUdf(col("ids"))).as("p"))
      .select(col("p.id_a").as("doc_a"), col("p.id_b").as("doc_b"))
      .distinct()
    timeIt("minhash_pairs")(noop(mpairs))

    // ---- kll agg alone (no orderBy, no quantile UDFs) ----
    val exactFns = graft.sketch.agg.SketchFunctions(
      graft.sketch.agg.SketchConfig(kllK = 32768, tdigestCentroids = 32768))
    val ev = t(spark, sfDir, "events")
    timeIt("kll_agg_only")(noop(
      ev.groupBy(col("event_type")).agg(exactFns.kllAgg(col("value")).as("sk"))))
    timeIt("tdigest_agg_only")(noop(
      ev.groupBy(col("event_type")).agg(exactFns.tdigestAgg(col("value")).as("sk"))))
    timeIt("events_scan_only")(noop(ev.select(col("event_type"), col("value"))))

    // latency: window vs digest
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val latencyFns = graft.sketch.agg.SketchFunctions(
      graft.sketch.agg.SketchConfig(tdigestCentroids = 262144))
    val deltas = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(((unix_micros(col("ts").cast("timestamp"))
        - unix_micros(col("prev_ts").cast("timestamp")))
        .cast("double") / 1000000.0).as("delta_s"))
    timeIt("latency_deltas_only")(noop(deltas))
    timeIt("latency_with_digest")(noop(
      deltas.agg(latencyFns.tdigestAgg(col("delta_s")).as("sk"))))

    spark.stop()
  }
}
