package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sketch.agg.{SketchConfig, SketchFunctions}
import graft.text.TextSqlFunctions

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry exercises one operator family from SURVEY.md §2 over
  * the driver's parquet tables; `oracleSql` gives the DuckDB-equivalent SQL.
  * Sketch parameters are sized so the probabilistic answers are exact with
  * overwhelming probability at verify scale (e.g. 5 event types in a
  * 27191×9 CMS; KLL k=8192 > group size ⇒ zero compactions ⇒ exact
  * inverse-CDF quantiles), making the oracle comparison deterministic.
  * Queries whose outputs are genuinely approximate at scale have no oracle
  * entry (driver records rows-only) and are additionally bound-checked in
  * the ScalaTest suites.
  */
object SparkEntry {
  private val fns = SketchFunctions.default
  // KLL with zero compactions and t-digest with singleton centroids at
  // verify scale (nc > πn/2 ⇒ every point its own centroid ⇒ exact extrema);
  // sized for per-group n up to ~20k so the oracles stay exact through sf0.1
  private val exactFns = SketchFunctions(SketchConfig(kllK = 32768, tdigestCentroids = 32768))
  private val tfns = TextSqlFunctions.default

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val ev = t(spark, "/root/testdata/sf0.001", "events")
    ev.groupBy(col("event_type"))
      .agg(
        fns.hllAgg(col("user_id").cast("string")).as("hll"),
        fns.tdigestAgg(col("value")).as("td"),
        count(lit(1)).as("turns"))
      .select(
        col("event_type"),
        fns.hllCardinality(col("hll")).as("approx_users"),
        fns.tdigestQuantile(col("td"), lit(0.5)).as("value_p50"),
        col("turns"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CMS point queries (count-min.js:67-78): exact on the small domain
    "q_cms_event_counts" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val sk = ev.agg(fns.cmsAgg(col("event_type")).as("sk"))
      ev.select(col("event_type")).distinct()
        .crossJoin(sk)
        .select(col("event_type"), fns.cmsQuery(col("sk"), col("event_type")).as("cnt"))
        .orderBy("event_type")
    },
    // CMM bias-corrected estimator (count-mean-min.js:31-49)
    "q_cmm_event_counts" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val sk = ev.agg(fns.cmmAgg(col("event_type")).as("sk"))
      ev.select(col("event_type")).distinct()
        .crossJoin(sk)
        .select(col("event_type"), fns.cmmQuery(col("sk"), col("event_type")).as("est"))
        .orderBy("event_type")
    },
    // CMS sketch-space inner product (count-min.js:83-103)
    "q_cms_dot_events" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val a = ev.filter(col("event_id") % 2 === 0).agg(fns.cmsAgg(col("event_type")).as("a"))
      val b = ev.filter(col("event_id") % 2 === 1).agg(fns.cmsAgg(col("event_type")).as("b"))
      a.crossJoin(b).select(fns.cmsDot(col("a"), col("b")).as("dot"))
    },
    // StreamSummary top-k (stream-summary.js:158-200): capacity >= domain
    "q_topk_event_types" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      ev.agg(fns.topkAgg(col("event_type")).as("sk"))
        .select(explode(fns.topkAll(col("sk"))).as("e"))
        .select(col("e.value").as("value"), col("e.count").as("cnt"),
          col("e.error").as("err"))
        .orderBy("value")
    },
    // Bloom membership (bloom.js:64-77): no false negatives; FPR ~0 at 1MB
    "q_bloom_brand_membership" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val sk = part.agg(fns.bloomAgg(col("p_brand")).as("sk"))
      val probes = part.select(col("p_brand").as("probe")).distinct()
        .unionAll(s.range(1, 3).select(concat(lit("ZZZ_NOPE_"), col("id")).as("probe")))
      probes.crossJoin(sk)
        .select(col("probe"), fns.bloomContains(col("sk"), col("probe")).as("present"))
        .orderBy("probe")
    },
    // HLL++ distinct counts (sparse phase exact at this cardinality)
    "q_hll_users_per_nation" -> { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(fns.hllLongAgg(col("c_custkey")).as("sk"))
        .select(col("c_nationkey"), fns.hllCardinality(col("sk")).as("d"))
        .orderBy("c_nationkey")
    },
    "q_hll_users_per_event_type" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(fns.hllLongAgg(col("user_id")).as("sk"))
        .select(col("event_type"), fns.hllCardinality(col("sk")).as("d"))
        .orderBy("event_type")
    },
    // t-digest extremes + total weight, exact in singleton-centroid regime
    "q_tdigest_value_extrema" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(exactFns.tdigestAgg(col("value")).as("sk"))
        .select(col("event_type"),
          // round(·,6): the reference's mean-recentering (t-digest.js:168)
          // injects ~1-ulp float noise into min/max; the data is 2-decimal,
          // so 6-decimal rounding is lossless and both engines agree bitwise
          round(exactFns.tdigestQuantile(col("sk"), lit(0.0)), 6).as("vmin"),
          round(exactFns.tdigestQuantile(col("sk"), lit(1.0)), 6).as("vmax"),
          exactFns.tdigestSize(col("sk")).as("n"))
        .orderBy("event_type")
    },
    // KLL inverse-CDF quantiles, exact with zero compactions
    "q_kll_value_quantiles" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(exactFns.kllAgg(col("value")).as("sk"))
        .select(col("event_type"),
          exactFns.kllQuantile(col("sk"), lit(0.25)).as("p25"),
          exactFns.kllQuantile(col("sk"), lit(0.5)).as("p50"),
          exactFns.kllQuantile(col("sk"), lit(0.75)).as("p75"),
          exactFns.kllQuantile(col("sk"), lit(0.99)).as("p99"))
        .orderBy("event_type")
    },
    // NGram counting (ngram.js:19-40): exact by construction
    "q_ngram_gram_counts" -> { (s, dir) =>
      val sp = s
      import sp.implicits._
      val part = t(s, dir, "part")
      val sk = part.agg(fns.ngramAgg(col("p_name")).as("sk"))
      Seq("an", "ol", "ra", "re").toDF("gram")
        .crossJoin(sk)
        .select(col("gram"), fns.ngramQuery(col("sk"), col("gram")).as("cnt"))
        .orderBy("gram")
    },
    // NGram similarity surface (ngram.js:62-80)
    "q_ngram_brand_similarity" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val a = part.filter(col("p_brand") === "Brand#1").agg(fns.ngramAgg(col("p_name")).as("a"))
      val b = part.filter(col("p_brand") === "Brand#2").agg(fns.ngramAgg(col("p_name")).as("b"))
      a.crossJoin(b).select(
        fns.ngramDot(col("a"), col("b")).as("dot"),
        fns.ngramCosine(col("a"), col("b")).as("cosine"))
    },
    // ---- training-pipeline ops over documents/embeddings ----
    // whitespace token counting (exact, SQL-expressible)
    "q_token_counts" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          tfns.tokenCountUdf(col("text")).cast("long").as("tokens"))
        .orderBy("doc_id")
    },
    // exact dedup: hash-groupBy distinct + normalized 64-bit fingerprints
    "q_dedup_exact" -> { (s, dir) =>
      t(s, dir, "documents")
        .agg(
          count(lit(1)).as("docs"),
          countDistinct(col("text")).as("distinct_texts"),
          countDistinct(tfns.fingerprintUdf(col("text"))).as("distinct_fps"),
          (count(lit(1)) - countDistinct(col("text"))).as("dupes"))
    },
    // brute-force cosine ANN baseline: top-3 neighbors per query vector
    "q_ann_top3" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val joined = broadcast(q)
        .crossJoin(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
      val w = Window.partitionBy(col("query_id")).orderBy(desc("s"), asc("neighbor_id"))
      joined.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("rank").cast("long").as("rank"), col("neighbor_id"))
        .orderBy("query_id", "rank")
    },
    // ANN scale path: LSH bucket equi-join (no cross join) + exact rerank;
    // reports recall@1 of the bucket-join pipeline vs the brute-force oracle
    "q_ann_lsh_recall" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val emb = t(s, dir, "embeddings")
      val banded = emb.select(col("vec_id"), col("embedding"),
        explode(tfns.annBucketsParamUdf(col("embedding"), lit(10), lit(12))).as("bucket"))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
          col("a.embedding").as("qe"), col("b.embedding").as("ne"))
        .distinct()
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
      val w = Window.partitionBy(col("query_id")).orderBy(desc("s"), asc("neighbor_id"))
      val lshTop = cand.withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("lsh_top1"))
      // brute-force truth for recall, over a 200-query sample (the exact
      // all-pairs pass is O(n^2) and only needed as a measuring stick)
      val bf = broadcast(emb.filter(col("vec_id") < 200)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
        .crossJoin(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne")))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          tfns.cosineUdf(col("qe"), col("ne")).as("s"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1)
        .select(col("query_id"), col("neighbor_id").as("bf_top1"))
      lshTop.join(bf, "query_id")
        .agg(count(lit(1)).as("queries_with_candidates"),
          sum(when(col("lsh_top1") === col("bf_top1"), 1).otherwise(0)).as("top1_agreement"))
    },
    // ---- approximate-at-scale paths: rows-only checks (no oracle) ----
    // language-ID + quality + fingerprint profile of the documents table
    "q_text_profile" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          tfns.langIdUdf(col("text")).as("lang_pred"),
          tfns.qualityScoreUdf(col("text")).as("quality"),
          tfns.bpeishCountUdf(col("text")).cast("long").as("bpeish_tokens"),
          tfns.fingerprintUdf(col("text")).as("fp"))
    },
    // MinHash-LSH near-dup candidate search: band keys → shuffle join —
    // the 10^12-doc scale path (no all-pairs); plus SimHash hammings
    "q_minhash_near_dup" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), tfns.minhashSigUdf(col("text")).as("sig"),
          tfns.simhashUdf(col("text")).as("sh"))
      val banded = docs.select(col("doc_id"), col("sh"),
        explode(tfns.minhashBandsUdf(col("sig"))).as("band"))
      val pairs = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          tfns.hammingUdf(col("a.sh"), col("b.sh")).as("hamming"))
        .distinct()
      pairs.agg(count(lit(1)).as("candidate_pairs"),
        min(col("hamming")).as("min_hamming"))
        .select(col("candidate_pairs"), coalesce(col("min_hamming"), lit(64)).as("min_hamming"))
    },
    "q_hll_global_users_estimate" -> { (s, dir) =>
      t(s, dir, "events").agg(fns.hllAgg(col("user_id").cast("string")).as("sk"))
        .select(fns.hllEstimate(col("sk")).as("estimate"),
          fns.hllCardinality(col("sk")).as("cardinality"))
    },
    "q_tdigest_value_quantiles" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(fns.tdigestAgg(col("value")).as("sk"))
        .select(col("event_type"),
          fns.tdigestQuantile(col("sk"), lit(0.5)).as("p50"),
          fns.tdigestQuantile(col("sk"), lit(0.9)).as("p90"),
          fns.tdigestCdf(col("sk"), lit(0.0)).as("cdf_0"))
    },
    // flagship latency shape: lag() window per entity → t-digest of deltas
    // (SURVEY.md §7.3); approximate → rows-only
    "q_latency_quantiles" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, dir, "events")
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val deltas = ev
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .filter(col("prev_ts").isNotNull)
        .select((unix_micros(col("ts").cast("timestamp"))
          - unix_micros(col("prev_ts").cast("timestamp")))
          .cast("double").as("delta_us"))
      deltas.agg(fns.tdigestAgg(col("delta_us")).as("sk"))
        .select(
          fns.tdigestQuantile(col("sk"), lit(0.5)).as("p50_us"),
          fns.tdigestQuantile(col("sk"), lit(0.95)).as("p95_us"),
          fns.tdigestSize(col("sk")).as("n"))
    },
    "q_bloom_jaccard_halves" -> { (s, dir) =>
      val ev = t(s, dir, "events")
      val a = ev.filter(col("event_id") % 2 === 0)
        .agg(fns.bloomAgg(col("user_id").cast("string")).as("a"))
      val b = ev.filter(col("event_id") % 2 === 1)
        .agg(fns.bloomAgg(col("user_id").cast("string")).as("b"))
      a.crossJoin(b).select(
        fns.bloomJaccard(col("a"), col("b")).as("jaccard"),
        fns.bloomCover(col("a"), col("b")).as("cover"),
        fns.bloomSize(col("a")).as("size_a"))
    })

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the approximate rows-only entries.
    */
  def oracleSql: Map[String, String] = Map(
    "q_cms_event_counts" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "q_cmm_event_counts" ->
      """WITH c AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS cnt FROM events GROUP BY event_type),
        |     t AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM events)
        |SELECT event_type,
        |       CASE WHEN raw < 0 THEN 0 WHEN raw > cnt THEN cnt ELSE raw END AS est
        |FROM (SELECT event_type, cnt, cnt - (total - cnt) * (1.0/27190.0) AS raw FROM c, t) x
        |ORDER BY event_type""".stripMargin,
    "q_cms_dot_events" ->
      """WITH a AS (SELECT event_type, count(*) AS c FROM events WHERE event_id % 2 = 0 GROUP BY 1),
        |     b AS (SELECT event_type, count(*) AS c FROM events WHERE event_id % 2 = 1 GROUP BY 1)
        |SELECT CAST(COALESCE(SUM(a.c*b.c), 0) AS DOUBLE) AS dot
        |FROM a JOIN b USING (event_type)""".stripMargin,
    "q_topk_event_types" ->
      """SELECT event_type AS value, count(*) AS cnt, CAST(0 AS BIGINT) AS err
        |FROM events GROUP BY event_type ORDER BY value""".stripMargin,
    "q_bloom_brand_membership" ->
      """SELECT probe, present FROM (
        |  SELECT p_brand AS probe, TRUE AS present FROM (SELECT DISTINCT p_brand FROM part)
        |  UNION ALL SELECT 'ZZZ_NOPE_1' AS probe, FALSE AS present
        |  UNION ALL SELECT 'ZZZ_NOPE_2' AS probe, FALSE AS present)
        |ORDER BY probe""".stripMargin,
    "q_hll_users_per_nation" ->
      "SELECT c_nationkey, count(DISTINCT c_custkey) AS d FROM customer GROUP BY c_nationkey ORDER BY c_nationkey",
    "q_hll_users_per_event_type" ->
      "SELECT event_type, count(DISTINCT user_id) AS d FROM events GROUP BY event_type ORDER BY event_type",
    "q_tdigest_value_extrema" ->
      """SELECT event_type, round(min(value), 6) AS vmin, round(max(value), 6) AS vmax,
        |       CAST(count(value) AS DOUBLE) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_kll_value_quantiles" ->
      """SELECT event_type,
        |       quantile_disc(value, 0.25) AS p25,
        |       quantile_disc(value, 0.5) AS p50,
        |       quantile_disc(value, 0.75) AS p75,
        |       quantile_disc(value, 0.99) AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_ngram_gram_counts" ->
      """WITH grams AS (
        |  SELECT lower(substr(p_name, CAST(i AS INT), 2)) AS gram
        |  FROM (SELECT p_name, unnest(range(1, length(p_name))) AS i FROM part))
        |SELECT g.gram, (SELECT count(*) FROM grams WHERE grams.gram = g.gram) AS cnt
        |FROM (SELECT unnest(['an','ol','ra','re']) AS gram) g ORDER BY gram""".stripMargin,
    "q_token_counts" ->
      """SELECT doc_id, length(text) - length(replace(text, ' ', '')) + 1 AS tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_exact" ->
      """SELECT count(*) AS docs, count(DISTINCT text) AS distinct_texts,
        |       count(DISTINCT lower(text)) AS distinct_fps,
        |       count(*) - count(DISTINCT text) AS dupes
        |FROM documents""".stripMargin,
    "q_ann_top3" ->
      """WITH sims AS (
        |  SELECT e1.vec_id AS query_id, e2.vec_id AS neighbor_id,
        |         list_cosine_similarity(e1.embedding, e2.embedding) AS s
        |  FROM embeddings e1 JOIN embeddings e2
        |    ON e1.vec_id < 5 AND e2.vec_id <> e1.vec_id)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank
        |  FROM sims) ranked
        |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,
    "q_ngram_brand_similarity" ->
      """WITH ga AS (SELECT gram, count(*) AS c FROM (
        |       SELECT lower(substr(p_name, CAST(i AS INT), 2)) AS gram
        |       FROM (SELECT p_name, unnest(range(1, length(p_name))) AS i
        |             FROM part WHERE p_brand = 'Brand#1')) GROUP BY gram),
        |     gb AS (SELECT gram, count(*) AS c FROM (
        |       SELECT lower(substr(p_name, CAST(i AS INT), 2)) AS gram
        |       FROM (SELECT p_name, unnest(range(1, length(p_name))) AS i
        |             FROM part WHERE p_brand = 'Brand#2')) GROUP BY gram),
        |     d AS (SELECT CAST(COALESCE(SUM(ga.c*gb.c), 0) AS DOUBLE) AS dot
        |           FROM ga JOIN gb USING (gram)),
        |     na AS (SELECT sqrt(CAST(SUM(c*c) AS DOUBLE)) AS n FROM ga),
        |     nb AS (SELECT sqrt(CAST(SUM(c*c) AS DOUBLE)) AS n FROM gb)
        |SELECT d.dot AS dot, d.dot/(na.n*nb.n) AS cosine FROM d, na, nb""".stripMargin)
}
