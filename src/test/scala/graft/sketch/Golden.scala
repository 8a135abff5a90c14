package graft.sketch

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loader for the node-generated golden files (scripts/gen_goldens.js) that
  * replay fixed sequences through the reference at /root/reference.
  */
object Golden {
  def load(name: String): JValue = {
    val in = getClass.getResourceAsStream(s"/golden/$name")
    require(in != null, s"missing golden resource $name — run scripts/gen_goldens.js")
    try JsonMethods.parse(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  def ints(j: JValue): Seq[Int] = j match {
    case JArray(xs) => xs.map(int)
    case other      => sys.error(s"expected array, got $other")
  }
  def longs(j: JValue): Seq[Long] = j match {
    case JArray(xs) => xs.map(long)
    case other      => sys.error(s"expected array, got $other")
  }
  def doubles(j: JValue): Seq[Double] = j match {
    case JArray(xs) => xs.map(double)
    case other      => sys.error(s"expected array, got $other")
  }
  def strings(j: JValue): Seq[String] = j match {
    case JArray(xs) => xs.map { case JString(s) => s; case o => sys.error(s"not a string: $o") }
    case other      => sys.error(s"expected array, got $other")
  }
  def arr(j: JValue): Seq[JValue] = j match {
    case JArray(xs) => xs
    case other      => sys.error(s"expected array, got $other")
  }
  def int(j: JValue): Int = j match {
    case JInt(v)     => v.toInt
    case JLong(v)    => v.toInt
    case JDouble(v)  => v.toInt
    case JDecimal(v) => v.toInt
    case o           => sys.error(s"not an int: $o")
  }
  def long(j: JValue): Long = j match {
    case JInt(v)     => v.toLong
    case JLong(v)    => v
    case JDouble(v)  => v.toLong
    case JDecimal(v) => v.toLong
    case o           => sys.error(s"not a long: $o")
  }
  def double(j: JValue): Double = j match {
    case JInt(v)     => v.toDouble
    case JLong(v)    => v.toDouble
    case JDouble(v)  => v
    case JDecimal(v) => v.toDouble
    case JNull       => Double.NaN
    case o           => sys.error(s"not a double: $o")
  }
  def bool(j: JValue): Boolean = j match {
    case JBool(b) => b
    case o        => sys.error(s"not a bool: $o")
  }

  /** The same LCG as scripts/gen_goldens.js (uint32 wrap / 2^32). */
  final class Lcg(seed: Int) {
    private var s: Long = seed.toLong & 0xffffffffL
    def next(): Double = {
      s = (s * 1664525L + 1013904223L) & 0xffffffffL
      s.toDouble / 4294967296.0
    }
  }
}
