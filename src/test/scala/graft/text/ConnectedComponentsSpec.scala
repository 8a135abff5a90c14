package graft.text

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Connected components (large-star/small-star): planted shapes, equality
  * with a brute-force union-find on seeded random graphs, the O(log n)
  * round bound on a long path (plain propagation would need diameter
  * rounds and trip maxIter), and invariance to input presentation.
  */
class ConnectedComponentsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-cc-test")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = { if (spark != null) spark.stop() }

  private def run(edges: Seq[(Long, Long)], maxIter: Int = 50): Map[Long, Long] = {
    val ss = spark; import ss.implicits._
    ConnectedComponents.run(edges.toDF("a", "b"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // union-by-min above makes every root the component min; snapshot keys
    // before the final find pass (path compression mutates the map)
    val ks = parent.keys.toList
    ks.map(k => k -> find(k)).toMap
  }

  test("planted shapes: chain, star, pair, self-loop, duplicates") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),   // chain -> rep 1
      (11L, 10L), (12L, 10L), (10L, 13L),       // star  -> rep 10
      (21L, 20L),                               // pair  -> rep 20
      (30L, 30L),                               // self-loop only: dropped entirely
      (2L, 1L), (1L, 2L))                       // duplicates / reversed
    val got = run(edges)
    val want = Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("matches brute-force union-find on seeded random graphs") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = Seq.fill(160)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) == unionFind(edges), s"seed=$seed")
    }
  }

  test("long path converges within the O(log n) round budget") {
    // a 300-node path has diameter 299: plain min-propagation would blow
    // the 50-round cap; large-star/small-star needs ~2*log2(n)+4 rounds
    val edges = (0L until 299L).map(i => (i, i + 1))
    val got = run(edges, maxIter = 50)
    assert(got.size == 300 && got.values.forall(_ == 0L))
  }

  test("result is invariant to input presentation (order / direction / partitioning)") {
    val ss = spark; import ss.implicits._
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(120)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val base = run(edges)
    val shuffled = rnd.shuffle(edges.map { case (a, b) => (b, a) })
    val df = shuffled.toDF("x", "y").repartition(7)
    val got = ConnectedComponents.run(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == base)
  }
}
