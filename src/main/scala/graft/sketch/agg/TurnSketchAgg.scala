package graft.sketch.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.sketch._

/** Input projection for the composite transcript aggregator. */
case class TurnInput(conv_id: String, tool: String, len: java.lang.Double)

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
    var turns: Long) extends Serializable

/** The flagship six-sketch build as ONE Aggregator: one aggregation-buffer
  * lookup and one input conversion per row instead of six. This is the
  * operator `SketchJob`'s map-side pass uses through the UDAF path — at
  * 10^12 rows the per-row constant is the whole game.
  */
final class TurnSketchAgg(
    hllP: Int = HllSketch.DefaultP,
    cmsWidth: Int = CmsSketch.DefaultBins,
    cmsDepth: Int = CmsSketch.DefaultHash,
    topKCapacity: Int = SpaceSavingSketch.DefaultCounters,
    tdigestNc: Int = TDigestSketch.DefaultCentroids,
    kllK: Int = KllSketch.DefaultK,
    bloomW: Int = BloomSketch.DefaultBits,
    bloomD: Int = BloomSketch.DefaultHash)
    extends Aggregator[TurnInput, TurnSketches, TurnSketchResult] {

  def zero: TurnSketches = new TurnSketches(
    HllSketch(hllP), CmsSketch(cmsWidth, cmsDepth), SpaceSavingSketch(topKCapacity),
    TDigestSketch.fast(tdigestNc), KllSketch(kllK), BloomSketch(bloomW, bloomD), 0L)

  def reduce(b: TurnSketches, v: TurnInput): TurnSketches = {
    if (v != null) {
      if (v.conv_id != null) {
        b.hll.add(v.conv_id)
        b.bloom.add(v.conv_id)
      }
      if (v.tool != null) {
        b.cms.add(v.tool)
        b.topk.add(v.tool)
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
    a.bloom.unionInPlace(b.bloom)
    a.turns += b.turns
    a
  }

  def finish(b: TurnSketches): TurnSketchResult = TurnSketchResult(
    b.hll.toBytes, b.cms.toBytes, b.topk.toBytes,
    b.td.toBytes, b.kll.toBytes, b.bloom.toBytes, b.turns)

  def bufferEncoder: Encoder[TurnSketches] = Encoders.kryo[TurnSketches]
  def outputEncoder: Encoder[TurnSketchResult] = Encoders.product[TurnSketchResult]
}
