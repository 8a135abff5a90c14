package graft.sketch.agg

import com.esotericsoftware.kryo.{Kryo, Serializer}
import com.esotericsoftware.kryo.io.{Input, Output}
import org.apache.spark.serializer.KryoRegistrator

import graft.sketch._
import graft.text.MinHashSketch

/** Kryo serializers for sketch aggregation buffers: instead of Kryo's
  * field-walking default, buffers serialize through the canonical binary
  * codec and a level-1 deflate. Partial CMS/Bloom states are mostly zeros,
  * so this shrinks the partial-agg shuffle payload ~5–20× — at 10^12 rows
  * the shuffle between partial and final aggregation is (chunks × groups ×
  * sketch size), and this is the knob that keeps it small.
  *
  * Activate per session:
  * `.config("spark.kryo.registrator", "graft.sketch.agg.GraftKryoRegistrator")`
  * (Encoders.kryo buffers go through Spark's KryoSerializer, which honors
  * the registrator.)
  */
class GraftKryoRegistrator extends KryoRegistrator {

  private def codecSerializer[T](enc: T => Array[Byte], dec: Array[Byte] => T): Serializer[T] =
    new Serializer[T] {
      override def write(kryo: Kryo, out: Output, t: T): Unit = {
        val raw = enc(t)
        val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
        deflater.setInput(raw)
        deflater.finish()
        val buf = new Array[Byte](raw.length + 64)
        val bos = new java.io.ByteArrayOutputStream(math.max(64, raw.length / 8))
        while (!deflater.finished()) {
          val n = deflater.deflate(buf)
          bos.write(buf, 0, n)
        }
        deflater.end()
        val packed = bos.toByteArray
        out.writeInt(raw.length, true)
        out.writeInt(packed.length, true)
        out.writeBytes(packed)
      }
      override def read(kryo: Kryo, in: Input, cls: Class[T]): T = {
        val rawLen = in.readInt(true)
        val packedLen = in.readInt(true)
        val packed = in.readBytes(packedLen)
        val inflater = new java.util.zip.Inflater()
        inflater.setInput(packed)
        val raw = new Array[Byte](rawLen)
        var off = 0
        while (off < rawLen && !inflater.finished()) {
          off += inflater.inflate(raw, off, rawLen - off)
        }
        inflater.end()
        dec(raw)
      }
    }

  override def registerClasses(kryo: Kryo): Unit = {
    kryo.register(classOf[BloomSketch],
      codecSerializer[BloomSketch](_.toBytes, BloomSketch.fromBytes))
    kryo.register(classOf[CmsSketch],
      codecSerializer[CmsSketch](_.toBytes, CmsSketch.fromBytes))
    kryo.register(classOf[CmmSketch],
      codecSerializer[CmmSketch](_.toBytes, CmmSketch.fromBytes))
    kryo.register(classOf[NGramSketch],
      codecSerializer[NGramSketch](_.toBytes, NGramSketch.fromBytes))
    kryo.register(classOf[SpaceSavingSketch],
      codecSerializer[SpaceSavingSketch](_.toBytes, SpaceSavingSketch.fromBytes))
    kryo.register(classOf[TDigestSketch],
      codecSerializer[TDigestSketch](_.toBytes, TDigestSketch.fromBytes))
    kryo.register(classOf[HllSketch],
      codecSerializer[HllSketch](_.toBytes, HllSketch.fromBytes))
    kryo.register(classOf[KllSketch],
      codecSerializer[KllSketch](_.toBytes, KllSketch.fromBytes))
    kryo.register(classOf[MinHashSketch],
      codecSerializer[MinHashSketch](_.toBytes, MinHashSketch.fromBytes))
    kryo.register(classOf[TurnSketches],
      codecSerializer[TurnSketches](
        { t =>
          // bloom is optional (TurnSketchAgg bloomW=0): empty bytes sentinel
          val parts = Seq(t.hll.toBytes, t.cms.toBytes, t.topk.toBytes,
            t.td.toBytes, t.kll.toBytes,
            if (t.bloom != null) t.bloom.toBytes else Array.emptyByteArray)
          val bb = java.nio.ByteBuffer.allocate(8 + parts.map(_.length + 4).sum)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.putLong(t.turns)
          parts.foreach { p => bb.putInt(p.length); bb.put(p) }
          val out = new Array[Byte](bb.position()); bb.flip(); bb.get(out); out
        },
        { bytes =>
          val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val turns = bb.getLong()
          def part(): Array[Byte] = { val a = new Array[Byte](bb.getInt()); bb.get(a); a }
          val hll = HllSketch.fromBytes(part()); val cms = CmsSketch.fromBytes(part())
          val topk = SpaceSavingSketch.fromBytes(part())
          val td = TDigestSketch.fromBytes(part()); val kll = KllSketch.fromBytes(part())
          val bloomBytes = part()
          new TurnSketches(hll, cms, topk, td, kll,
            if (bloomBytes.isEmpty) null else BloomSketch.fromBytes(bloomBytes), turns)
        }))
  }
}
