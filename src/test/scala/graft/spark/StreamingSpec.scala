package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sketch.agg.SketchFunctions

/** Sketch UDAFs under Structured Streaming: mergeable state makes them valid
  * streaming aggregates (`update` output mode) — the incremental path the
  * north rule leaves open (SURVEY.md §1.4 note on streaming).
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private lazy val fns = SketchFunctions.default

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-streaming-test")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming groupBy + sketch UDAFs == batch result after all batches") {
    val sp = spark
    import sp.implicits._
    implicit val sqlCtx = sp.sqlContext

    val stream = MemoryStream[(String, String)] // (role, conv_id)
    val agg = stream.toDF().toDF("role", "conv_id")
      .groupBy($"role")
      .agg(fns.hllAgg($"conv_id").as("hll"), count(lit(1)).as("n"))
      .select($"role", fns.hllCardinality($"hll").as("d"), $"n")

    val query = agg.writeStream
      .format("memory")
      .queryName("stream_out")
      .outputMode("update")
      .start()

    val all = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    (0 until 5).foreach { batch =>
      val rows = (0 until 200).map { i =>
        val role = if (i % 2 == 0) "user" else "assistant"
        (role, s"conv-${batch * 37 + i % 140}")
      }
      all ++= rows
      stream.addData(rows)
      query.processAllAvailable()
    }
    query.stop()

    // last update per role reflects the full stream
    val streamed = sp.sql(
      "SELECT role, d FROM stream_out ORDER BY role, d")
      .collect().groupBy(_.getString(0)).map { case (r, rs) => r -> rs.map(_.getLong(1)).max }
    val batch = all.toSeq.toDF("role", "conv_id")
      .groupBy($"role").agg(fns.hllAgg($"conv_id").as("hll"))
      .select($"role", fns.hllCardinality($"hll").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = all.groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).distinct.size }

    assert(streamed.keySet == batch.keySet)
    batch.foreach { case (role, d) =>
      assert(streamed(role) == d, s"stream vs batch for $role")
      assert(math.abs(d - exact(role)) <= math.max(1, exact(role) / 100),
        s"accuracy for $role: $d vs ${exact(role)}")
    }
  }
}
