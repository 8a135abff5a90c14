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

  /** One event-time island of a key's sessions. `maxLen` is tracked
    * exactly (the KLL's retained maximum can sit below the true max after
    * compaction, so a column named len_max must not read quantile(1.0)).
    */
  case class SessionState(
      turns: Long,
      firstTsMs: Long,
      lastTsMs: Long,
      maxLen: Double,
      kllLen: Array[Byte])

  /** Per-key state: every island not yet sealed by the watermark, sorted by
    * start, pairwise separated by more than the gap. An island is only
    * emitted once `end + gap <= watermark` — before that, an admissible
    * (non-late) event could still arrive and bridge it, so eager emission
    * would split sessions that global gap-sessionization keeps whole.
    * State is bounded by the islands inside one watermark window per key
    * (events behind the watermark are dropped by the engine).
    */
  case class PendingSessions(islands: Seq[SessionState])

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

  /** Event-time for a drain sentinel that seals EVERY pending island of a
    * finite backfill (the "flush" close-out of a bounded replay).
    *
    * [[sessionize]] emits an island only once the watermark reaches its
    * seal point `end + gap`; on a finite stream the final watermark is
    * `maxEventMs - gap`, so trailing islands (seal points in
    * `(maxEventMs - gap, maxEventMs + gap]`) stay pending forever — by
    * design for an unbounded stream, but a bounded backfill wants every
    * session out. Appending ONE sentinel event at this timestamp (under a
    * reserved key the caller filters from the output) pushes the final
    * watermark to `maxEventMs + gap + marginMs`, strictly past the largest
    * possible seal point `maxEventMs + gap`, so every real island seals —
    * either in its key's data invocation or via the armed event-time
    * timeout (arm = seal − 1 < wm fires under the engine's strict-< rule).
    * This also makes the engine-inherent unreachable alignment documented
    * at the timeout arm (final watermark landing exactly ON a clamped seal
    * point) mechanically impossible: the sentinel's watermark overshoots
    * every real seal point by `marginMs >= 1`.
    *
    * The sentinel's own singleton island never seals (its seal point sits
    * `gap` past the final watermark) and is dropped with its reserved key.
    */
  def drainSentinelMs(maxEventMs: Long, gapSeconds: Long, marginMs: Long = 1000L): Long = {
    require(marginMs >= 1L, s"margin must be >= 1 ms, got $marginMs")
    maxEventMs + 2 * gapSeconds * 1000L + marginMs
  }

  /** Per-conversation sessionization with EXACT global gap semantics under
    * any batching: one micro-batch can carry MANY sessions of the same key
    * (the 100 TB backfill-replay case — Trigger.AvailableNow over a table
    * lands everything in one batch), so the key's state holds a sorted
    * list of event-time islands. A new event merges into the island it
    * falls within `gapSeconds` of (possibly bridging two islands into
    * one); an island is emitted only once the watermark reaches its
    * `end + gap` — at that point no admissible event can ever attach to it
    * (any such event would be at or behind the watermark and is dropped by
    * the engine), so the emitted sessions equal batch gap-sessionization
    * of the full admissible stream. Eagerly emitting an island the moment a
    * later same-key event lands past the gap would be wrong: a THIRD,
    * still-admissible event between them could bridge both.
    *
    * State per key = islands inside one watermark window (events behind
    * the watermark never create islands); in a backfill replay cap the
    * batch via maxFilesPerTrigger so the watermark advances between
    * batches and seals islands incrementally.
    */
  def sessionize(turns: Dataset[TurnEvent], gapSeconds: Long): Dataset[SessionSummary] = {
    implicit val stateEnc: Encoder[PendingSessions] = Encoders.product[PendingSessions]
    implicit val outEnc: Encoder[SessionSummary] = Encoders.product[SessionSummary]
    implicit val strEnc: Encoder[String] = Encoders.STRING
    val gapMs = gapSeconds * 1000L

    // live (mutable) island: stats + the KLL it feeds
    final class Isl(var turns: Long, var first: Long, var last: Long,
        var maxLen: Double, var kll: KllSketch)

    def summary(convId: String, i: Isl): SessionSummary =
      SessionSummary(convId, i.turns, i.first, i.last - i.first,
        i.kll.quantileLower(0.5), i.maxLen)

    turns
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[PendingSessions, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (convId: String, events: Iterator[TurnEvent], state: GroupState[PendingSessions]) =>
          // getCurrentWatermarkMs: in a timeout invocation this is the
          // eviction watermark that fired the timeout; in a data invocation
          // it is the (conservative, one batch older) late-events watermark
          val wm = state.getCurrentWatermarkMs()
          val islands = scala.collection.mutable.ArrayBuffer.empty[Isl]
          state.getOption.foreach(_.islands.foreach { s =>
            islands += new Isl(s.turns, s.firstTsMs, s.lastTsMs, s.maxLen,
              KllSketch.fromBytes(s.kllLen))
          })
          if (!state.hasTimedOut) {
            val evs = events.toArray
            java.util.Arrays.sort(evs, Ordering.by((e: TurnEvent) => e.ts.getTime))
            evs.foreach { e =>
              val t = e.ts.getTime
              // islands are sorted by start and pairwise > gap apart, so t
              // attaches to at most one island — the first whose end+gap
              // reaches t — and can additionally bridge it to its successor
              var i = 0
              while (i < islands.length && islands(i).last + gapMs < t) i += 1
              if (i < islands.length && t >= islands(i).first - gapMs) {
                val isl = islands(i)
                isl.turns += 1
                isl.first = math.min(isl.first, t)
                isl.last = math.max(isl.last, t)
                isl.maxLen = math.max(isl.maxLen, e.text_len)
                isl.kll.add(e.text_len)
                if (i + 1 < islands.length &&
                    islands(i + 1).first - isl.last <= gapMs) {
                  val nxt = islands.remove(i + 1) // t bridged two islands
                  isl.turns += nxt.turns
                  isl.last = math.max(isl.last, nxt.last)
                  isl.maxLen = math.max(isl.maxLen, nxt.maxLen)
                  isl.kll = isl.kll.mergeInPlace(nxt.kll)
                }
              } else {
                val isl = new Isl(1L, t, t, e.text_len, KllSketch(kllK))
                isl.kll.add(e.text_len)
                islands.insert(i, isl) // new singleton island (> gap from both sides)
              }
            }
          }
          // emit every sealed island; keep the rest pending. Seal predicate
          // is `end + gap <= wm` (NOT strict <): the engine's late filter
          // drops rows with ts <= watermark, so every event that can still
          // arrive has ts > wm, and an event attaches to an island only if
          // ts <= end + gap — an island with end + gap <= wm therefore can
          // never gain another event and is safe to emit NOW, including in
          // a data invocation whose watermark has just caught up to it.
          val (sealedI, open) = islands.partition(_.last + gapMs <= wm)
          if (open.nonEmpty) {
            state.update(PendingSessions(open.map(i =>
              SessionState(i.turns, i.first, i.last, i.maxLen, i.kll.toBytes)).toSeq))
            // Arm ONE ms below the earliest pending seal point s (every
            // open island has s > wm, so s - 1 >= wm): the engine fires a
            // timeout iff armTs < W (strict), so arming at s - 1 fires
            // exactly when the watermark REACHES s — the first moment the
            // island is sealed under the <= predicate. Together with the
            // <=-seal above this closes the old 1 ms hole (seal point == wm
            // with the final watermark landing at wm+1: such an island is
            // now emitted by the data invocation itself, regression-tested
            // in StreamingSpec). The clamp to wm + 1 (setTimeoutTimestamp
            // throws at or below the watermark) binds only when s == wm+1;
            // the sole remaining unreachable firing is then a FINAL
            // watermark landing exactly ON s — inherent to the engine's
            // contract (arm floor wm+1, strict-< fire), since detecting "W
            // advanced to exactly wm+1 and never again" would need an arm
            // below the floor. Any later invocation of the key re-arms and
            // re-narrows this to its new wm.
            state.setTimeoutTimestamp(
              math.max(open.map(_.last + gapMs).min - 1, wm + 1))
          } else if (state.exists) {
            state.remove()
          }
          sealedI.map(summary(convId, _)).iterator
      }
  }
}
