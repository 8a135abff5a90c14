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

  /** Emitted when a session times out (no turns for `gapSeconds`). */
  case class SessionSummary(
      conv_id: String,
      turns: Long,
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

  /** Per-conversation sessionization with event-time timeout. */
  def sessionize(turns: Dataset[TurnEvent], gapSeconds: Long): Dataset[SessionSummary] = {
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]
    implicit val strEnc: Encoder[String] = Encoders.STRING

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
            Iterator.single(SessionSummary(convId, s.turns,
              s.lastTsMs - s.firstTsMs,
              kll.quantileLower(0.5), s.maxLen))
          } else {
            val prev = state.getOption
            val kll = prev.map(p => KllSketch.fromBytes(p.kllLen))
              .getOrElse(KllSketch(kllK))
            var turnsN = prev.map(_.turns).getOrElse(0L)
            var first = prev.map(_.firstTsMs).getOrElse(Long.MaxValue)
            var last = prev.map(_.lastTsMs).getOrElse(Long.MinValue)
            var maxLen = prev.map(_.maxLen).getOrElse(Double.NegativeInfinity)
            events.foreach { e =>
              kll.add(e.text_len)
              turnsN += 1
              if (e.text_len > maxLen) maxLen = e.text_len
              val t = e.ts.getTime
              if (t < first) first = t
              if (t > last) last = t
            }
            state.update(SessionState(turnsN, first, last, maxLen, kll.toBytes))
            // clamp to just past the watermark: setTimeoutTimestamp throws
            // if the timeout is not later than the current watermark. Spark
            // 4.1 filters rows behind the watermark before this function
            // (FlatMapGroupsWithStateExec.watermarkPredicateForDataForLateEvents),
            // so the clamp is defense-in-depth for engines/configs that do
            // deliver late rows — a late event then closes the session at
            // the watermark instead of crashing the query
            state.setTimeoutTimestamp(
              math.max(last + gapSeconds * 1000, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }
}
