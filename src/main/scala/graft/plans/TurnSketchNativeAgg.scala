package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.sketch._
import graft.sketch.agg.TurnSketches
import graft.sketch.core.Fnv1a

/** Native Catalyst aggregate for the flagship transcript sketch build — the
  * (c)-tier of the custom-operator ladder: a `TypedImperativeAggregate`
  * that reads `UTF8String`s straight out of the `InternalRow` and hashes
  * their backing memory in place. Compared to the `Aggregator`+`udaf()`
  * path this removes, per row: the encoder's struct conversion, the
  * `cast(x as binary)` byte copies, and the case-class allocation — nothing
  * is materialized between the scan and the sketch arrays.
  *
  * Per-operator semantics are identical to `TurnSketchAgg` (same sketches,
  * same hashes: xxHash64 over UTF-8 bytes for HLL, FNV-1a for Bloom with
  * non-ASCII falling back to the UTF-16 String path, tool names interned
  * per buffer for CMS/Space-Saving). Buffers serialize through the shared
  * composite codec, so spill, shuffle and sort-based fallback all work.
  *
  * Defaults `bloomW = 0` (conv-id Bloom OFF, `bloom_conv` empty) — the same
  * default as `TurnSketchAgg`, so the two registrations cannot silently
  * diverge. A mergeable membership filter must be capacity-sized to the
  * group's distinct count via `Bloom.create(n, p)` — an undersized default
  * saturates (FPR → 1, zero information) while 4×-ing the partial state
  * every map task ships, so both flagships make the filter strictly opt-in.
  *
  * SQL: `SELECT role, turn_sketch_native(conv_id, tool, text_len) ...`
  * (register via [[GraftExtensions]] or [[TurnSketchNativeAgg.register]]).
  */
case class TurnSketchNativeAgg(
    conv: Expression,
    tool: Expression,
    len: Expression,
    hllP: Int = HllSketch.DefaultP,
    cmsWidth: Int = CmsSketch.DefaultBins,
    cmsDepth: Int = CmsSketch.DefaultHash,
    topKCapacity: Int = SpaceSavingSketch.DefaultCounters,
    tdigestNc: Int = TDigestSketch.DefaultCentroids,
    kllK: Int = KllSketch.DefaultK,
    bloomW: Int = 0,
    bloomD: Int = BloomSketch.DefaultHash,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TurnSketches] {

  override def children: Seq[Expression] = Seq(conv, tool, len)

  // reject wrong-typed arguments at analysis time, not as an executor-side
  // ClassCastException mid-job (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult = {
    val expected = Seq(StringType, StringType, DoubleType)
    val actual = children.map(_.dataType)
    if (actual == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING, DOUBLE), got " +
        actual.map(_.simpleString).mkString("(", ", ", ")"))
  }

  override def nullable: Boolean = false

  override def dataType: DataType = TurnSketchNativeAgg.ResultType

  override def createAggregationBuffer(): TurnSketches = new TurnSketches(
    HllSketch(hllP), CmsSketch(cmsWidth, cmsDepth), SpaceSavingSketch(topKCapacity),
    TDigestSketch.fast(tdigestNc), KllSketch(kllK),
    if (bloomW > 0) BloomSketch(bloomW, bloomD) else null, 0L)

  override def update(b: TurnSketches, input: InternalRow): TurnSketches = {
    val c = conv.eval(input)
    if (c != null) {
      val u = c.asInstanceOf[UTF8String]
      b.hll.addUtf8Memory(u.getBaseObject, u.getBaseOffset, u.numBytes)
      if (b.bloom != null) {
        val h = Fnv1a.fnv1aUtf8MemoryOrSentinel(u.getBaseObject, u.getBaseOffset, u.numBytes)
        if (h != Fnv1a.NonAscii) b.bloom.addFnv(h.toInt)
        else b.bloom.add(u.toString)
      }
    }
    val t = tool.eval(input)
    if (t != null) {
      val s = b.internTool(t.asInstanceOf[UTF8String])
      b.cms.add(s)
      b.topk.add(s)
    }
    val l = len.eval(input)
    if (l != null) {
      val d = l.asInstanceOf[Number].doubleValue()
      b.td.add(d)
      b.kll.add(d)
    }
    b.turns += 1
    b
  }

  override def merge(a: TurnSketches, b: TurnSketches): TurnSketches = {
    a.hll.mergeInPlace(b.hll)
    a.cms.mergeInPlace(b.cms)
    a.topk.mergeInPlace(b.topk)
    a.td.mergeInPlace(b.td)
    a.kll.mergeInPlace(b.kll)
    if (a.bloom != null && b.bloom != null) a.bloom.unionInPlace(b.bloom)
    a.turns += b.turns
    a
  }

  override def eval(b: TurnSketches): Any = {
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    row.update(0, b.hll.toBytes)
    row.update(1, b.cms.toBytes)
    row.update(2, b.topk.toBytes)
    row.update(3, b.td.toBytes)
    row.update(4, b.kll.toBytes)
    row.update(5, if (b.bloom != null) b.bloom.toBytes else Array.emptyByteArray)
    row.setLong(6, b.turns)
    row
  }

  override def serialize(b: TurnSketches): Array[Byte] = TurnSketches.encode(b)
  override def deserialize(bytes: Array[Byte]): TurnSketches = TurnSketches.decode(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TurnSketchNativeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TurnSketchNativeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression])
      : TurnSketchNativeAgg =
    copy(conv = newChildren(0), tool = newChildren(1), len = newChildren(2))
}

object TurnSketchNativeAgg {
  val ResultType: StructType = StructType(Seq(
    StructField("hll_conv", BinaryType, nullable = false),
    StructField("cms_tool", BinaryType, nullable = false),
    StructField("topk_tool", BinaryType, nullable = false),
    StructField("tdigest_len", BinaryType, nullable = false),
    StructField("kll_len", BinaryType, nullable = false),
    StructField("bloom_conv", BinaryType, nullable = false),
    StructField("turns", LongType, nullable = false)))

  val FunctionName = "turn_sketch_native"

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[TurnSketchNativeAgg].getName, null, FunctionName,
    "_FUNC_(conv_id, tool, len) - composite transcript sketch aggregate " +
      "(HLL++ conv, CMS + top-k tool, t-digest + KLL len) over raw UTF8String " +
      "memory. conv-id Bloom is OFF unless registered with bloomW > 0 " +
      "(capacity-size it via Bloom.create(n, p)).",
    "", "", "", "agg_funcs", "4.0.0", "", "built-in")

  def builder(cmsWidth: Int = CmsSketch.DefaultBins, cmsDepth: Int = CmsSketch.DefaultHash,
      bloomW: Int = 0): Seq[Expression] => Expression = { children =>
    require(children.length == 3,
      s"$FunctionName expects (conv_id, tool, len), got ${children.length} args")
    TurnSketchNativeAgg(children(0), children(1), children(2),
      cmsWidth = cmsWidth, cmsDepth = cmsDepth, bloomW = bloomW)
      .toAggregateExpression()
  }

  /** Session-scoped registration (tests, notebooks). */
  def register(spark: SparkSession, cmsWidth: Int = CmsSketch.DefaultBins,
      cmsDepth: Int = CmsSketch.DefaultHash, bloomW: Int = 0): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(FunctionName), info, builder(cmsWidth, cmsDepth, bloomW))
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — injects the native
  * aggregate at session build time (the spark-submit path; no driver code
  * needed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier(TurnSketchNativeAgg.FunctionName),
      TurnSketchNativeAgg.info, TurnSketchNativeAgg.builder()))
  }
}
