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
      codecSerializer[TurnSketches](TurnSketches.encode, TurnSketches.decode))
  }
}
