package graft.sketch.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.sketch._

/** Typed `Aggregator`s — one per sketch (SURVEY.md §2.2/§2.4): `reduce` is
  * the reference's `add`, `merge` the (associative, commutative) combine,
  * `finish` serializes to the canonical binary codec so sketch results are
  * plain `BinaryType` columns.
  *
  * Buffers are live mutable sketch objects: with a non-primitive buffer type
  * Spark routes these through `ObjectHashAggregateExec`, which keeps the
  * object per group and serializes (Kryo → single binary field) only at
  * shuffle/spill — verified by plan inspection in SparkIntegrationSpec.
  *
  * Inputs are nullable boxed types; null rows are skipped, matching the
  * reference's null handling (ngram.js:19, t-digest.js:82).
  */
object SketchAggs {

  // ---- value-ingesting aggregators ----

  final class BloomAgg(w: Int, d: Int) extends Aggregator[String, BloomSketch, Array[Byte]] {
    def zero: BloomSketch = BloomSketch(w, d)
    def reduce(b: BloomSketch, v: String): BloomSketch = { if (v != null) b.add(v); b }
    def merge(a: BloomSketch, b: BloomSketch): BloomSketch = a.unionInPlace(b)
    def finish(b: BloomSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class CmsAgg(w: Int, d: Int) extends Aggregator[String, CmsSketch, Array[Byte]] {
    def zero: CmsSketch = CmsSketch(w, d)
    def reduce(b: CmsSketch, v: String): CmsSketch = { if (v != null) b.add(v); b }
    def merge(a: CmsSketch, b: CmsSketch): CmsSketch = a.mergeInPlace(b)
    def finish(b: CmsSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[CmsSketch] = Encoders.kryo[CmsSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Capacity-sized Bloom: buffers constructed through `Bloom.create(n, p)`
    * (bloom.js:35-44) — the sizing path a membership job must use instead of
    * riding a fixed-width default (SURVEY.md §2.1).
    */
  final class BloomCreateAgg(n: Int, p: Double)
      extends Aggregator[String, BloomSketch, Array[Byte]] {
    def zero: BloomSketch = BloomSketch.create(n, p)
    def reduce(b: BloomSketch, v: String): BloomSketch = { if (v != null) b.add(v); b }
    def merge(a: BloomSketch, b: BloomSketch): BloomSketch = a.unionInPlace(b)
    def finish(b: BloomSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[BloomSketch] = Encoders.kryo[BloomSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Error-sized CMS: buffers constructed through `CountMin.create(n, e, p)`
    * (count-min.js:37-43; note the d=⌈ln 1000⌉=7 default-depth quirk vs the
    * plain constructor's 9).
    */
  final class CmsCreateAgg(n: Long, e: Double, p: Double)
      extends Aggregator[String, CmsSketch, Array[Byte]] {
    def zero: CmsSketch = CmsSketch.create(n, e, p)
    def reduce(b: CmsSketch, v: String): CmsSketch = { if (v != null) b.add(v); b }
    def merge(a: CmsSketch, b: CmsSketch): CmsSketch = a.mergeInPlace(b)
    def finish(b: CmsSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[CmsSketch] = Encoders.kryo[CmsSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class CmmAgg(w: Int, d: Int) extends Aggregator[String, CmmSketch, Array[Byte]] {
    def zero: CmmSketch = CmmSketch(w, d)
    def reduce(b: CmmSketch, v: String): CmmSketch = { if (v != null) b.add(v); b }
    def merge(a: CmmSketch, b: CmmSketch): CmmSketch = { a.mergeInPlace(b); a }
    def finish(b: CmmSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[CmmSketch] = Encoders.kryo[CmmSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class NGramAgg(n: Int, caseSensitive: Boolean)
      extends Aggregator[String, NGramSketch, Array[Byte]] {
    def zero: NGramSketch = NGramSketch(n, caseSensitive)
    def reduce(b: NGramSketch, v: String): NGramSketch = { b.add(v); b }
    def merge(a: NGramSketch, b: NGramSketch): NGramSketch = a.mergeInPlace(b)
    def finish(b: NGramSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[NGramSketch] = Encoders.kryo[NGramSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class TopKAgg(capacity: Int)
      extends Aggregator[String, SpaceSavingSketch, Array[Byte]] {
    def zero: SpaceSavingSketch = SpaceSavingSketch(capacity)
    def reduce(b: SpaceSavingSketch, v: String): SpaceSavingSketch = {
      if (v != null) b.add(v); b
    }
    def merge(a: SpaceSavingSketch, b: SpaceSavingSketch): SpaceSavingSketch = a.mergeInPlace(b)
    def finish(b: SpaceSavingSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[SpaceSavingSketch] = Encoders.kryo[SpaceSavingSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Weighted top-k: (value, count) pairs, e.g. pre-aggregated partials. */
  final class TopKWeightedAgg(capacity: Int)
      extends Aggregator[(String, Long), SpaceSavingSketch, Array[Byte]] {
    def zero: SpaceSavingSketch = SpaceSavingSketch(capacity)
    def reduce(b: SpaceSavingSketch, v: (String, Long)): SpaceSavingSketch = {
      if (v != null && v._1 != null) b.add(v._1, v._2); b
    }
    def merge(a: SpaceSavingSketch, b: SpaceSavingSketch): SpaceSavingSketch = a.mergeInPlace(b)
    def finish(b: SpaceSavingSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[SpaceSavingSketch] = Encoders.kryo[SpaceSavingSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class TDigestAgg(nc: Int)
      extends Aggregator[java.lang.Double, TDigestSketch, Array[Byte]] {
    def zero: TDigestSketch = TDigestSketch.fast(nc)
    def reduce(b: TDigestSketch, v: java.lang.Double): TDigestSketch = {
      if (v != null) b.add(v.doubleValue()); b
    }
    def merge(a: TDigestSketch, b: TDigestSketch): TDigestSketch = a.mergeInPlace(b)
    def finish(b: TDigestSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[TDigestSketch] = Encoders.kryo[TDigestSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class KllAgg(k: Int) extends Aggregator[java.lang.Double, KllSketch, Array[Byte]] {
    def zero: KllSketch = KllSketch(k)
    def reduce(b: KllSketch, v: java.lang.Double): KllSketch = {
      if (v != null) b.add(v.doubleValue()); b
    }
    def merge(a: KllSketch, b: KllSketch): KllSketch = a.mergeInPlace(b)
    def finish(b: KllSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[KllSketch] = Encoders.kryo[KllSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class HllAgg(p: Int) extends Aggregator[String, HllSketch, Array[Byte]] {
    def zero: HllSketch = HllSketch(p)
    def reduce(b: HllSketch, v: String): HllSketch = { if (v != null) b.add(v); b }
    def merge(a: HllSketch, b: HllSketch): HllSketch = a.mergeInPlace(b)
    def finish(b: HllSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[HllSketch] = Encoders.kryo[HllSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Long-keyed HLL: hashes the 8-byte value directly, skipping string
    * formatting on the hot path (id columns at 10^12-row scale).
    */
  final class HllLongAgg(p: Int) extends Aggregator[java.lang.Long, HllSketch, Array[Byte]] {
    def zero: HllSketch = HllSketch(p)
    def reduce(b: HllSketch, v: java.lang.Long): HllSketch = {
      if (v != null) b.addLong(v.longValue()); b
    }
    def merge(a: HllSketch, b: HllSketch): HllSketch = a.mergeInPlace(b)
    def finish(b: HllSketch): Array[Byte] = b.toBytes
    def bufferEncoder: Encoder[HllSketch] = Encoders.kryo[HllSketch]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ---- sketch-merging aggregators (re-aggregate BinaryType sketch columns:
  //      the treeReduce-style second level, SURVEY.md §3.3) ----

  /** Generic shell: BUF starts null (parameters come from the first sketch
    * seen), merge folds byte payloads through `fromBytes` + `mergeInPlace`.
    */
  abstract class MergeAgg[S >: Null <: AnyRef: reflect.ClassTag]
      extends Aggregator[Array[Byte], S, Array[Byte]] {
    protected def decode(bytes: Array[Byte]): S
    protected def combine(a: S, b: S): S
    protected def encode(s: S): Array[Byte]
    def zero: S = null
    def reduce(b: S, bytes: Array[Byte]): S =
      if (bytes == null) b
      else if (b == null) decode(bytes)
      else combine(b, decode(bytes))
    def merge(a: S, b: S): S =
      if (a == null) b else if (b == null) a else combine(a, b)
    def finish(s: S): Array[Byte] = if (s == null) null else encode(s)
    def bufferEncoder: Encoder[S] = Encoders.kryo[S](implicitly[reflect.ClassTag[S]])
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  final class BloomMergeAgg extends MergeAgg[BloomSketch] {
    def decode(b: Array[Byte]) = BloomSketch.fromBytes(b)
    def combine(a: BloomSketch, b: BloomSketch) = a.unionInPlace(b)
    def encode(s: BloomSketch) = s.toBytes
  }
  final class CmsMergeAgg extends MergeAgg[CmsSketch] {
    def decode(b: Array[Byte]) = CmsSketch.fromBytes(b)
    def combine(a: CmsSketch, b: CmsSketch) = a.mergeInPlace(b)
    def encode(s: CmsSketch) = s.toBytes
  }
  final class CmmMergeAgg extends MergeAgg[CmmSketch] {
    def decode(b: Array[Byte]) = CmmSketch.fromBytes(b)
    def combine(a: CmmSketch, b: CmmSketch) = { a.mergeInPlace(b); a }
    def encode(s: CmmSketch) = s.toBytes
  }
  final class NGramMergeAgg extends MergeAgg[NGramSketch] {
    def decode(b: Array[Byte]) = NGramSketch.fromBytes(b)
    def combine(a: NGramSketch, b: NGramSketch) = a.mergeInPlace(b)
    def encode(s: NGramSketch) = s.toBytes
  }
  final class TopKMergeAgg extends MergeAgg[SpaceSavingSketch] {
    def decode(b: Array[Byte]) = SpaceSavingSketch.fromBytes(b)
    def combine(a: SpaceSavingSketch, b: SpaceSavingSketch) = a.mergeInPlace(b)
    def encode(s: SpaceSavingSketch) = s.toBytes
  }
  final class TDigestMergeAgg extends MergeAgg[TDigestSketch] {
    def decode(b: Array[Byte]) = TDigestSketch.fromBytes(b)
    def combine(a: TDigestSketch, b: TDigestSketch) = a.mergeInPlace(b)
    def encode(s: TDigestSketch) = s.toBytes
  }
  final class KllMergeAgg extends MergeAgg[KllSketch] {
    def decode(b: Array[Byte]) = KllSketch.fromBytes(b)
    def combine(a: KllSketch, b: KllSketch) = a.mergeInPlace(b)
    def encode(s: KllSketch) = s.toBytes
  }
  final class HllMergeAgg extends MergeAgg[HllSketch] {
    def decode(b: Array[Byte]) = HllSketch.fromBytes(b)
    def combine(a: HllSketch, b: HllSketch) = a.mergeInPlace(b)
    def encode(s: HllSketch) = s.toBytes
  }
}
