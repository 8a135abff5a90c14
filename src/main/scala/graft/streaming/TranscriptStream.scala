package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.sketch.KllSketch
import graft.sketch.agg.SketchFunctions

/** Structured-Streaming operators over transcript turn streams — the
  * incremental counterparts of the batch flagship:
  *
  *  - [[windowedRoleSketches]]: watermarked event-time tumbling windows ×
  *    role, aggregating the mergeable sketch UDAFs (sketch merge being
  *    associative+commutative is exactly what makes them legal streaming
  *    aggregates);
  *  - [[sessionize]]: per-conversation custom state via
  *    `flatMapGroupsWithState` — a session closes after `gapSeconds` of
  *    event-time silence (watermark-driven timeout) and emits one summary
  *    row carrying exact counters plus a KLL sketch of turn lengths.
  *
  * State is a plain product of primitives + the sketch's own binary codec,
  * so the HDFS/RocksDB state store holds compact bytes, and state survives
  * any Spark upgrade that keeps the codec (no Java/Kryo serialization of
  * live objects into the store).
  */
object TranscriptStream {

  /** One turn event on the stream (a projection of the input_hint schema). */
  case class TurnEvent(conv_id: String, role: String, text_len: Double, ts: Timestamp)

  /** Accumulating per-conversation session state. `maxLen` is tracked
    * exactly (the KLL's retained maximum can sit below the true max after
    * compaction, so a column named len_max must not read quantile(1.0)).
    */
  case class SessionState(
      turns: Long,
      firstTsMs: Long,
      lastTsMs: Long,
      maxLen: Double,
      kllLen: Array[Byte])

  /** Emitted when a session closes — by event-time timeout (watermark
    * passed last + gap) or intra-batch (a later same-key event sits more
    * than the gap past this session's end).
    */
  case class SessionSummary(
      conv_id: String,
      turns: Long,
      first_ts_ms: Long,
      duration_ms: Long,
      len_p50: Double,
      len_max: Double)

  /** Tumbling event-time windows × role with the sketch aggregates;
    * `update`/`append` both legal (sketches merge). The watermark bounds
    * state: windows older than it are finalized and dropped.
    */
  def windowedRoleSketches(turns: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "5 minutes",
      fns: SketchFunctions = SketchFunctions.default): DataFrame = {
    turns
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("role"))
      .agg(
        fns.hllAgg(col("conv_id")).as("hll_conv"),
        fns.kllAgg(col("text_len").cast("double")).as("kll_len"),
        count(lit(1)).as("turns"))
      .select(col("window.start").as("window_start"), col("role"),
        fns.hllCardinality(col("hll_conv")).as("approx_convs"),
        fns.kllQuantile(col("kll_len"), lit(0.5)).as("len_p50"),
        col("turns"))
  }

  private val kllK = 256

  /** Per-conversation sessionization with event-time timeout AND
    * intra-batch gap-splitting: one micro-batch can carry MANY sessions of
    * the same key (the 100 TB backfill-replay case — Trigger.AvailableNow
    * over a table lands everything in one batch), so this function sorts
    * the key's batch slice by event time and closes a session whenever the
    * next event sits more than `gapSeconds` past the current session's
    * end. Only the final (still-open) session per key waits for the
    * watermark-driven timeout. Memory bound = one key's events in one
    * micro-batch (they are materialized to sort; at production batch sizes
    * cap via maxFilesPerTrigger/maxBytesPerTrigger, which also restores
    * incremental emission).
    */
  def sessionize(turns: Dataset[TurnEvent], gapSeconds: Long): Dataset[SessionSummary] = {
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val gapMs = gapSeconds * 1000L

    def summary(convId: String, s: SessionState, kll: KllSketch): SessionSummary =
      SessionSummary(convId, s.turns, s.firstTsMs, s.lastTsMs - s.firstTsMs,
        kll.quantileLower(0.5), s.maxLen)

    turns
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (convId: String, events: Iterator[TurnEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTs + gap: close and emit the session
            val s = state.get
            val kll = KllSketch.fromBytes(s.kllLen)
            state.remove()
            Iterator.single(summary(convId, s, kll))
          } else {
            // event-time order within the batch slice; an event behind the
            // open session's end but within the gap merges into it (late
            // but inside the watermark — same semantics as cross-batch)
            val evs = events.toArray
            java.util.Arrays.sort(evs, Ordering.by((e: TurnEvent) => e.ts.getTime))
            val out = List.newBuilder[SessionSummary]
            var st: SessionState = state.getOption.orNull
            var kll: KllSketch =
              if (st != null) KllSketch.fromBytes(st.kllLen) else null
            evs.foreach { e =>
              val t = e.ts.getTime
              if (st != null && t - st.lastTsMs > gapMs) {
                out += summary(convId, st, kll) // closed intra-batch
                st = null
              }
              if (st == null) {
                kll = KllSketch(kllK)
                st = SessionState(0L, t, t, Double.NegativeInfinity, null)
              }
              kll.add(e.text_len)
              st = SessionState(st.turns + 1, math.min(st.firstTsMs, t),
                math.max(st.lastTsMs, t), math.max(st.maxLen, e.text_len), null)
            }
            if (st != null) {
              state.update(st.copy(kllLen = kll.toBytes))
              // clamp to just past the watermark: setTimeoutTimestamp throws
              // if the timeout is not later than the current watermark. Spark
              // 4.1 filters rows behind the watermark before this function
              // (FlatMapGroupsWithStateExec.watermarkPredicateForDataForLateEvents),
              // so the clamp is defense-in-depth for engines/configs that do
              // deliver late rows — a late event then closes the session at
              // the watermark instead of crashing the query
              state.setTimeoutTimestamp(
                math.max(st.lastTsMs + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.result().iterator
          }
      }
  }
}
