package graft.jobs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation to defuse hot-key skew (SURVEY.md §4.1):
  * phase 1 aggregates by (keys ++ salt-bucket) so a hot key's rows spread
  * over `buckets` reducers building partial sketches; phase 2 merges the
  * partials per key. Because every sketch merge is associative+commutative,
  * salted results equal unsalted ones — bitwise for the linear sketches
  * (HLL/CMS/Bloom/NGram), within rank-error for t-digest/KLL.
  *
  * Pure DataFrame plan shape — no custom Catalyst rule needed; AQE's skew
  * handling composes with it.
  */
object SaltedAgg {

  /** @param partialAggs aggregation columns for phase 1 (e.g.
    *   `fns.hllAgg(col("conv_id")).as("hll")`); their output names must match
    *   what `finalAggs` read.
    * @param finalAggs merge aggregations for phase 2 (e.g.
    *   `fns.hllMergeAgg(col("hll")).as("hll")`).
    */
  def apply(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      buckets: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(buckets)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }
}
