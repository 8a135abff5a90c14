package graft.sketch.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.sketch._

/** Input projection for the composite transcript aggregator. Ids arrive as
  * UTF-8 bytes (`cast(conv_id as binary)`) — the sketches hash bytes
  * directly, so the per-row char[] decode + String allocation of a String
  * encoder never happens. At 10^12 rows that allocation is the difference
  * between scaling to 32 threads and stalling the heap.
  */
case class TurnInput(conv_id: Array[Byte], tool: Array[Byte], len: java.lang.Double)

/** All six north-rule sketches, serialized. */
case class TurnSketchResult(
    hll_conv: Array[Byte],
    cms_tool: Array[Byte],
    topk_tool: Array[Byte],
    tdigest_len: Array[Byte],
    kll_len: Array[Byte],
    bloom_conv: Array[Byte],
    turns: Long)

/** Live composite buffer. */
final class TurnSketches(
    val hll: HllSketch,
    val cms: CmsSketch,
    val topk: SpaceSavingSketch,
    val td: TDigestSketch,
    val kll: KllSketch,
    val bloom: BloomSketch,
    var turns: Long) extends Serializable {
  /** Tool-name intern cache: the tool domain is tiny (~50 values, Zipf), so
    * the String the Space-Saving summary needs is decoded once per distinct
    * byte pattern per buffer, keyed by 64-bit content hash (collision odds
    * across a ~10^2 domain: ~1e-16). Transient — rebuilt empty after any
    * buffer serde.
    */
  @transient private var toolCache: ToolInterner = _
  private def interner: ToolInterner = {
    if (toolCache == null) toolCache = new ToolInterner
    toolCache
  }
  def internTool(b: Array[Byte]): String = interner.intern(b)
  def internTool(u: org.apache.spark.unsafe.types.UTF8String): String = interner.intern(u)
}

/** Byte-pattern → String intern cache for tiny Zipf domains (tool names):
  * each distinct pattern is decoded once. Shared by the UDAF buffer, the
  * native aggregate, and SketchJob's stage-1 groups so the seed/semantics
  * cannot drift between paths.
  *
  * Correctness + memory hardening: hits are verified by comparing the
  * actual bytes against the cached pattern (a hash collision must never
  * silently alias two tool names into one CMS/top-k key — and a byte
  * compare of a ~4-15 byte key is cheaper than a second hash pass, with a
  * deterministic rather than probabilistic guarantee), and the cache is
  * capped — past [[ToolInterner.MaxEntries]] distinct patterns (i.e. the
  * column is not actually a tiny domain) new patterns are decoded directly
  * instead of growing per-buffer memory without bound.
  */
final class ToolInterner {
  import ToolInterner._
  private val cache = new java.util.HashMap[java.lang.Long, Entry]()
  def intern(b: Array[Byte]): String = {
    val k = java.lang.Long.valueOf(graft.sketch.core.XxHash64.hashBytes(b, Seed))
    val e = cache.get(k)
    if (e != null && java.util.Arrays.equals(e.bytes, b)) e.s
    else if (e != null || cache.size >= MaxEntries) // collision or full: direct decode
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    else {
      val bytes = b.clone()
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      cache.put(k, new Entry(s, bytes,
        org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes)))
      s
    }
  }
  def intern(u: org.apache.spark.unsafe.types.UTF8String): String = {
    val k = java.lang.Long.valueOf(graft.sketch.core.XxHash64.hashMemory(
      u.getBaseObject, u.getBaseOffset, u.numBytes, Seed))
    val e = cache.get(k)
    if (e != null && u.equals(e.u8)) e.s // UTF8String.equals = memory compare, no alloc
    else if (e != null || cache.size >= MaxEntries) u.toString
    else {
      val bytes = u.getBytes // fresh copy
      val s = u.toString
      cache.put(k, new Entry(s, bytes,
        org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes)))
      s
    }
  }
}

object ToolInterner {
  private[agg] val Seed = 0x7007L
  /** Beyond this many distinct patterns the column is not a tool-like tiny
    * domain and caching would only burn memory (~100 KB at the cap).
    */
  private[agg] val MaxEntries = 1024
  private[agg] final class Entry(
      val s: String, val bytes: Array[Byte],
      val u8: org.apache.spark.unsafe.types.UTF8String)
}

object TurnSketches {
  /** Composite codec shared by the Kryo buffer serializer and the native
    * TypedImperativeAggregate's serialize/deserialize: length-prefixed
    * concatenation of each sketch's own binary codec (bloom optional —
    * empty bytes when disabled).
    */
  def encode(t: TurnSketches): Array[Byte] = {
    val parts = Seq(t.hll.toBytes, t.cms.toBytes, t.topk.toBytes,
      t.td.toBytes, t.kll.toBytes,
      if (t.bloom != null) t.bloom.toBytes else Array.emptyByteArray)
    val bb = java.nio.ByteBuffer.allocate(8 + parts.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(t.turns)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    val out = new Array[Byte](bb.position()); bb.flip(); bb.get(out); out
  }

  def decode(bytes: Array[Byte]): TurnSketches = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val turns = bb.getLong()
    def part(): Array[Byte] = { val a = new Array[Byte](bb.getInt()); bb.get(a); a }
    val hll = HllSketch.fromBytes(part()); val cms = CmsSketch.fromBytes(part())
    val topk = SpaceSavingSketch.fromBytes(part())
    val td = TDigestSketch.fromBytes(part()); val kll = KllSketch.fromBytes(part())
    val bloomBytes = part()
    new TurnSketches(hll, cms, topk, td, kll,
      if (bloomBytes.isEmpty) null else BloomSketch.fromBytes(bloomBytes), turns)
  }
}

/** The flagship multi-sketch build as ONE Aggregator: one aggregation-buffer
  * lookup and one input conversion per row instead of six. This is the
  * operator `SketchJob`'s map-side pass uses through the UDAF path — at
  * 10^12 rows the per-row constant is the whole game.
  *
  * `bloomW = 0` disables the conv-id Bloom (emits empty bytes). A mergeable
  * membership filter must be sized to the group's distinct count
  * (`Bloom.create(n, p)` — e.g. 12M convs @ 2% FPR needs ~14 MB); riding an
  * undersized default inside the hot per-role aggregation saturates the
  * filter (FPR → 1, zero information) while quadrupling the partial-state
  * shuffled per map task. Capacity-planned membership jobs configure it
  * explicitly; the throughput flagship runs the five capacity-valid
  * sketches. The default is therefore bloom-OFF — the same default as
  * `TurnSketchNativeAgg`, so migrating a job between the UDAF and the
  * native registration can never silently change which sketches it builds.
  */
final class TurnSketchAgg(
    hllP: Int = HllSketch.DefaultP,
    cmsWidth: Int = CmsSketch.DefaultBins,
    cmsDepth: Int = CmsSketch.DefaultHash,
    topKCapacity: Int = SpaceSavingSketch.DefaultCounters,
    tdigestNc: Int = TDigestSketch.DefaultCentroids,
    kllK: Int = KllSketch.DefaultK,
    bloomW: Int = 0,
    bloomD: Int = BloomSketch.DefaultHash)
    extends Aggregator[TurnInput, TurnSketches, TurnSketchResult] {

  def zero: TurnSketches = new TurnSketches(
    HllSketch(hllP), CmsSketch(cmsWidth, cmsDepth), SpaceSavingSketch(topKCapacity),
    TDigestSketch.fast(tdigestNc), KllSketch(kllK),
    if (bloomW > 0) BloomSketch(bloomW, bloomD) else null, 0L)

  def reduce(b: TurnSketches, v: TurnInput): TurnSketches = {
    if (v != null) {
      if (v.conv_id != null) {
        b.hll.addUtf8(v.conv_id)
        if (b.bloom != null) b.bloom.addUtf8(v.conv_id)
      }
      if (v.tool != null) {
        val tool = b.internTool(v.tool)
        b.cms.add(tool)
        b.topk.add(tool)
      }
      if (v.len != null) {
        b.td.add(v.len.doubleValue())
        b.kll.add(v.len.doubleValue())
      }
      b.turns += 1
    }
    b
  }

  def merge(a: TurnSketches, b: TurnSketches): TurnSketches = {
    a.hll.mergeInPlace(b.hll)
    a.cms.mergeInPlace(b.cms)
    a.topk.mergeInPlace(b.topk)
    a.td.mergeInPlace(b.td)
    a.kll.mergeInPlace(b.kll)
    if (a.bloom != null) a.bloom.unionInPlace(b.bloom)
    a.turns += b.turns
    a
  }

  def finish(b: TurnSketches): TurnSketchResult = TurnSketchResult(
    b.hll.toBytes, b.cms.toBytes, b.topk.toBytes,
    b.td.toBytes, b.kll.toBytes,
    if (b.bloom != null) b.bloom.toBytes else Array.emptyByteArray, b.turns)

  def bufferEncoder: Encoder[TurnSketches] = Encoders.kryo[TurnSketches]
  def outputEncoder: Encoder[TurnSketchResult] = Encoders.product[TurnSketchResult]
}
