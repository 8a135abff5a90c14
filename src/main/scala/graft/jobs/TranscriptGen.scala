package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}

import graft.sketch.core.XxHash64

/** One turn of a multi-turn transcript (BASELINE.json `input_hint` schema):
  * (conv_id, turn_idx, role, text, tool, ts) + derived partition column
  * ts_date.
  */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Deterministic synthetic transcripts (FIXTURES.md §1): generation is a pure
  * function of (seed, conv index) — independent of partitioning — so the
  * per-row invariant "per-turn text equality under stable (conv_id,
  * turn_idx) ordering" holds across any cluster layout. Zipf-skewed turn
  * counts plant hot conv_ids (salting tests), tool names are Zipf with
  * 'search' and 'bash' as planted heavy hitters, text lengths mix a short
  * uniform body with a lognormal-ish tail, and ts spans ~30 days for
  * partition-pruning tests.
  */
object TranscriptGen {

  val Roles: Array[String] = Array("user", "assistant", "system", "tool")
  val Tools: Array[String] =
    Array("search", "bash") ++ (0 until 48).map(i => f"tool_$i%02d")
  private val Words: Array[String] =
    ("the of and to in is that it for on with as was at by an be this have from or had not are but what all were when we there can".split(' ') ++
      (0 until 64).map(i => f"tok$i%02d")).toArray

  val BaseTsMillis: Long = 1735689600000L // 2025-01-01T00:00:00Z
  val SpanDays = 30

  /** Deterministic per-conv xorshift RNG seeded from the conv index. */
  private final class Rng(seed0: Long) {
    private var s: Long = XxHash64.hashLong(seed0, 0x5eed5eedL) | 1L
    def nextLong(): Long = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      s
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    def nextInt(n: Int): Int = ((nextLong() >>> 1) % n).toInt
  }

  /** Zipf-ish index in [0, n): heavy mass on low indices (s≈1). */
  private def zipfIndex(r: Rng, n: Int): Int = {
    val u = r.nextDouble()
    val idx = (math.pow(n.toDouble + 1.0, u) - 1.0).toInt
    math.min(idx, n - 1)
  }

  def genConv(convIndex: Long, hotConvs: Int, hotTurns: Int): Seq[Turn] = {
    val r = new Rng(convIndex)
    val convId = f"conv-$convIndex%08d"
    val nTurns =
      if (convIndex < hotConvs) hotTurns
      else 2 + zipfIndex(r, 24) // most convs short, tail to ~26 turns
    val dayOffset = r.nextInt(SpanDays)
    var ts = BaseTsMillis + dayOffset * 86400000L + r.nextInt(86400000)
    (0 until nTurns).map { turnIdx =>
      val role =
        if (turnIdx == 0 && r.nextInt(10) == 0) "system"
        else if (r.nextInt(5) == 0) "tool"
        else if (turnIdx % 2 == 0) "user"
        else "assistant"
      val tool = if (role == "tool") Tools(zipfIndex(r, Tools.length)) else null
      val baseLen = 3 + r.nextInt(40)
      val len =
        if (r.nextInt(20) == 0) baseLen * (5 + r.nextInt(40)) // long tail
        else baseLen
      val sb = new StringBuilder(len * 6)
      var i = 0
      while (i < len) {
        if (i > 0) sb.append(' ')
        sb.append(Words(r.nextInt(Words.length)))
        i += 1
      }
      ts += 500L + (r.nextDouble() * r.nextDouble() * 120000L).toLong
      Turn(convId, turnIdx, role, sb.toString, tool, new Timestamp(ts))
    }
  }

  /** Build the transcripts Dataset; `numConvs` conversations, a planted hot
    * head of `hotConvs` conversations with `hotTurns` turns each.
    */
  def dataset(
      spark: SparkSession,
      numConvs: Long,
      hotConvs: Int = 4,
      hotTurns: Int = 4000,
      parallelism: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.range(0, numConvs, 1, parallelism)
      .flatMap(i => genConv(i, hotConvs, hotTurns))
  }

  /** Write as date-partitioned Parquet — the Iceberg stand-in (no Iceberg jar
    * offline, SURVEY.md §7.6): `ts_date=YYYY-MM-DD/` directories give the
    * same Catalyst partition-pruning semantics an Iceberg `days(ts)`
    * partition transform would.
    */
  def write(spark: SparkSession, path: String, numConvs: Long,
      hotConvs: Int = 4, hotTurns: Int = 4000, parallelism: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    dataset(spark, numConvs, hotConvs, hotTurns, parallelism)
      .withColumn("ts_date", to_date(col("ts")))
      // derived column: metric queries over turn length then prune the wide
      // text column entirely (columnar scan reads ~1/10 the bytes)
      .withColumn("text_len", length(col("text")))
      // hash-cluster dates over a FIXED 16-task write stage ⇒ few well-sized
      // files per partition dir instead of (tasks × dates) small files, and
      // a write-stage memory envelope that does NOT scale with the session's
      // core count. The dynamic-partition write sorts each task's rows by
      // ts_date first, and those sort+parquet buffers are per-CONCURRENT-task:
      // an unpinned repartition(col) inherits spark.sql.shuffle.partitions, so
      // a local[32] generation session (64 partitions, 32 concurrent sorts)
      // blew the 24g heap on a cold cache — OOM in sort_addToSorter under
      // FileFormatWriter — while every warm-cache run had silently skipped
      // this stage. 16 concurrent writers is the envelope six rounds of
      // session(16) generation proved; the CPU-bound synth stage upstream
      // still runs at the session's full width (it is the map side of this
      // shuffle).
      .repartition(16, col("ts_date"))
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy("ts_date")
      .parquet(path)
  }

  /** Generate-once cache for tests/bench: writes only if missing. */
  def ensure(spark: SparkSession, path: String, numConvs: Long,
      hotConvs: Int = 4, hotTurns: Int = 4000, parallelism: Int = 32): String = {
    val dir = new java.io.File(path)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      write(spark, path, numConvs, hotConvs, hotTurns, parallelism)
    }
    path
  }

  /** CLI: TranscriptGen <outPath> <numConvs> [hotConvs hotTurns parallelism] */
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val numConvs = args(1).toLong
    val hotConvs = if (args.length > 2) args(2).toInt else 4
    val hotTurns = if (args.length > 3) args(3).toInt else 4000
    val par = if (args.length > 4) args(4).toInt else 32
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("TranscriptGen")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try write(spark, out, numConvs, hotConvs, hotTurns, par)
    finally spark.stop()
  }
}
