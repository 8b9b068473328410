package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns for hot keys at 100 TB.
  *
  * Spark's partial (map-side) aggregation already absorbs skew for
  * algebraic aggregates, and AQE splits skewed sort-merge join
  * partitions. These helpers cover the remaining cases: holistic
  * aggregates (count-distinct), and broadcast-ineligible equi-joins
  * where one key dominates.
  */
object SkewUtils {

  /** Skew-proof count-distinct per key: spread the shuffle over
    * (key, value) first — the hot key's values land on many reducers —
    * then count per key. Two balanced shuffles instead of one hot one. */
  def countDistinctSpread(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(key)
      // count(col), not count(*): COUNT(DISTINCT) ignores NULLs, so the
      // drop-in replacement must skip the surviving (key, NULL) row too
      .agg(count(col(value)).as(s"n_distinct_$value"))

  /** Salted equi-join for a skewed big side: the big side gets a
    * content-derived salt in [0, buckets); the small side is replicated
    * across every salt. The join key becomes (key, salt), so a hot key's
    * rows spread over `buckets` reducers. Semantics are identical to
    * `big.join(small, key)` — the salt never reaches the output. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col).toSeq: _*)), lit(buckets)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation for holistic hot-key sums when even
    * partial aggregation overflows a task (extreme single-key skew):
    * pre-aggregate on (key, salt), then merge per key. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
      buckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(struct(df.columns.map(col).toSeq: _*)), lit(buckets)))
    salted.groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(s"sum_$valueCol"))
  }
}
