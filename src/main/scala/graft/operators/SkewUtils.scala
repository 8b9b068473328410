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

  /** Exact distributed prefix sum (running total) of `weight` in the
    * total order given by `order` — the scale-safe replacement for a
    * bare `SUM(...) OVER (ORDER BY ...)` window, which funnels the
    * whole input through ONE task.
    *
    * Scheme (the classic two-pass parallel scan):
    *   1. `repartitionByRange(order)` — the RangePartitioner samples
    *      the FULL sort tuple, so partitions are balanced under ANY
    *      value distribution: a 99%-identical-value corpus still
    *      splits evenly because the unique tiebreaker inside `order`
    *      spreads the tied rows across range boundaries. (This is why
    *      range-scan beats value-space bucketing here: equi-width
    *      buckets collapse under Zipf skew, and even equi-depth
    *      `approx_percentile` edges cannot split a single heavy tied
    *      value across buckets.)
    *   2. Per-partition running totals via a window keyed on
    *      `spark_partition_id()` — each window partition is exactly
    *      one balanced range partition (~n/P rows).
    *   3. Partition offsets: a ≤P-row per-partition total aggregate,
    *      prefix-summed by a tiny non-equi self-join (range partitions
    *      are ordered by construction: every row in partition i sorts
    *      before every row in partition i+1) and broadcast back. That
    *      join is O(P²) PAIRS — safe by construction because P is
    *      `spark.sql.shuffle.partitions` (cluster CONFIGURATION, a few
    *      thousand at most), never data-sized. Anything data-sized
    *      (a group catalog) must NOT go through this shape — see
    *      [[groupRank]], whose offsets ride prefixSum recursively.
    *
    * Exactness: global cum(r) = offset(pid) + local cum(r), in exactly
    * the `order` total order — no tie-order change, so DuckDB oracles
    * written against `SUM OVER (ORDER BY ...)` match bit-for-bit.
    * Determinism: `order` MUST be a total order (include a unique
    * tiebreaker). Range boundaries are sampled with partition-index
    * seeds (deterministic), and even if boundaries moved, cum depends
    * only on the global order, never on where the cuts fall.
    *
    * `weight`'s Spark SQL type is preserved (pass a DECIMAL(38,0) cast
    * for money per the fixed-point rule; `lit(1L)` turns the cum into
    * the exact global rank). */
  def prefixSum(df: DataFrame, order: Seq[Column], weight: Column,
      out: String): DataFrame = {
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(p, order: _*)
      .withColumn("__psum_pid", spark_partition_id())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__psum_pid").orderBy(order: _*)
    val totals = parted.groupBy("__psum_pid").agg(sum(weight).as("__psum_t"))
    val offsets = totals
      .join(totals.select(col("__psum_pid").as("__b_pid"),
        col("__psum_t").as("__b_t")), col("__b_pid") < col("__psum_pid"), "left")
      .groupBy("__psum_pid")
      .agg(coalesce(sum(col("__b_t")), lit(0)).as("__psum_off"))
    parted.withColumn("__psum_local", sum(weight).over(w))
      .join(broadcast(offsets), Seq("__psum_pid"))
      .withColumn(out, col("__psum_off") + col("__psum_local"))
      .drop("__psum_pid", "__psum_local", "__psum_off")
  }

  /** Exact per-group rank (1-based, ROW_NUMBER semantics) in the order
    * `order` within each `group` — the skew-proof replacement for
    * `row_number().over(Window.partitionBy(group).orderBy(order))`,
    * whose window partition is ONE WHOLE GROUP (a 100-TB single-source
    * corpus funnels through one task).
    *
    * Decomposition: the global rank under the total order
    * (group asc, order...) is a [[prefixSum]] with weight 1 (range
    * partitioned — a huge group splits across partitions on the
    * in-group order's unique tiebreaker); subtracting the
    * strictly-lower-group population recovers the in-group 1-based
    * rank exactly. The strictly-lower populations are themselves a
    * prefix sum OVER THE COUNTS TABLE — ridden through [[prefixSum]]
    * recursively (one row per group is trivially a total order), so a
    * BILLION-group catalog (per-user ranks at 100 TB) scans range-
    * partitioned instead of exploding a G² non-equi self-join or
    * funneling G rows through one window task. The offsets join back
    * on the group key is a plain equi-join: catalog-sized offsets
    * broadcast under AQE automatically; bigger catalogs shuffle on
    * the same key the rank join needs anyway. Requires `order` to
    * total-order rows WITHIN a group (unique tiebreaker included). */
  def groupRank(df: DataFrame, group: String, order: Seq[Column],
      out: String): DataFrame = {
    val counts = df.groupBy(group).agg(count(lit(1)).as("__c"))
    val offs = prefixSum(counts, Seq(col(group).asc), col("__c"), "__gcum")
      .select(col(group), (col("__gcum") - col("__c")).as("__goff"))
    prefixSum(df, col(group).asc +: order, lit(1L), "__grank")
      .join(offs, Seq(group))
      .withColumn(out, col("__grank") - col("__goff"))
      .drop("__grank", "__goff")
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
