package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Gold}
import graft.sources.Tables

/** The approx-percentile scale twins track their exact oracles within
  * sketch error — the `tableStatsApprox` precedent applied to the
  * `percentile` family. Runs at sf0.1 (events = 100K rows >
  * [[Gold.PctAccuracy]] = 10K), where `approx_percentile` is genuinely
  * approximate, not degenerate-exact. */
class PercentileScaleSpec extends SparkSpec {
  private val bigDir = "/root/testdata/sf0.1"

  /** Exact rank band around quantile q: the sketch's rank error is
    * ≤ n/accuracy; q ± slack covers it with an order of magnitude to
    * spare at per-type populations (~25K rows → error ≲ 3 ranks,
    * band ≈ 50 ranks). ±1e-4 absorbs the fixedRound granularity. */
  private def assertInBand(events: org.apache.spark.sql.DataFrame,
      typ: String, valueSql: String, q: Double, got: Double): Unit = {
    val slack = 0.002
    val band = events.where(col("event_type") === typ)
      .agg(expr(s"percentile($valueSql, ${math.max(0.0, q - slack)})").as("lo"),
        expr(s"percentile($valueSql, ${math.min(1.0, q + slack)})").as("hi"))
      .head()
    val (lo, hi) = (band.getDouble(0) - 1e-4, band.getDouble(1) + 1e-4)
    assert(got >= lo && got <= hi,
      s"$typ $valueSql q=$q: approx $got outside exact band [$lo, $hi]")
  }

  test("approx value quantiles track exact within sketch error, same schema") {
    val exact = Events.valueQuantiles(spark, bigDir)
    val approx = Events.valueQuantilesApprox(spark, bigDir)
    assert(approx.schema == exact.schema)
    val e = Tables.events(spark, bigDir)
    approx.collect().foreach { r =>
      val typ = r.getAs[String]("event_type")
      assertInBand(e, typ, "value", 0.5, r.getAs[Double]("p50"))
      assertInBand(e, typ, "value", 0.9, r.getAs[Double]("p90"))
      assertInBand(e, typ, "value", 0.99, r.getAs[Double]("p99"))
    }
    // counts are not sketched: identical
    val en = exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.collect().foreach(r => assert(r.getLong(1) == en(r.getString(0))))
  }

  test("approx winsorization: bounds in band, clamps agree on ~all rows") {
    val exact = Events.winsorize(spark, bigDir)
    val approx = Events.winsorizeApprox(spark, bigDir)
    assert(approx.schema == exact.schema)
    val e = Tables.events(spark, bigDir)
    Events.winsorizeBoundsOf(e, exactPct = false).collect().foreach { r =>
      val typ = r.getAs[String]("event_type")
      assertInBand(e, typ, "value", 0.01, r.getAs[Double]("lo"))
      assertInBand(e, typ, "value", 0.99, r.getAs[Double]("hi"))
    }
    // a capped row's clamped VALUE legitimately shifts by the (tiny)
    // bound difference; what the sketch must preserve is WHICH rows get
    // capped — only values between the exact and approx bound (a
    // ≤ sketch-error sliver of each tail, ~1e-4 of ranks) can flip
    val joined = exact.select(col("event_id"), col("was_capped").as("ce"))
      .join(approx.select(col("event_id"), col("was_capped").as("ca")), "event_id")
    val n = joined.count()
    val differ = joined.where(col("ce") =!= col("ca")).count()
    assert(differ <= n / 500, s"$differ of $n was_capped flags differ")
  }

  test("approx robust anomalies: med/MAD in band, flag count tracks exact") {
    val exact = Events.robustAnomalies(spark, bigDir)
    val approx = Events.robustAnomaliesApprox(spark, bigDir)
    assert(approx.schema == exact.schema)
    val (ne, na) = (exact.count(), approx.count())
    assert(math.abs(ne - na) <= math.max(5L, ne / 10),
      s"anomaly counts diverged: exact $ne vs approx $na")
  }

  test("approx RFM: same schema, scores agree for ~all customers") {
    val exact = Gold.rfmSegments(spark, bigDir)
    val approx = Gold.rfmSegmentsApprox(spark, bigDir)
    assert(approx.schema == exact.schema)
    val key = Seq("customer_id")
    val joined = exact
      .select(col("customer_id"), col("r_score").as("re"),
        col("f_score").as("fe"), col("m_score").as("me"))
      .join(approx.select(col("customer_id"), col("r_score").as("ra"),
        col("f_score").as("fa"), col("m_score").as("ma")), key)
    val n = joined.count()
    assert(n == exact.count())
    val differ = joined.where(
      col("re") =!= col("ra") || col("fe") =!= col("fa") ||
        col("me") =!= col("ma")).count()
    // quintile edges can shift by the sketch's rank error; only
    // customers sitting exactly on a shifted edge can change score
    assert(differ <= n / 50, s"$differ of $n RFM score triples differ")
  }

  test("approx length profile: same schema, quantiles within rank tolerance") {
    import graft.operators.TextAnalysis
    val exact = TextAnalysis.lengthProfile(spark, bigDir).collect()
    val approx = TextAnalysis.lengthProfileApprox(spark, bigDir)
    assert(approx.schema ==
      TextAnalysis.lengthProfile(spark, bigDir).schema)
    val am = approx.collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("p10_tokens"), r.getAs[Double]("p50_tokens"),
          r.getAs[Double]("p90_tokens"))).toMap
    exact.foreach { r =>
      val (a10, a50, a90) = am(r.getAs[String]("source"))
      // token lengths are small integers: the sketch lands within a
      // few grid steps of the exact quantile
      assert(math.abs(a10 - r.getAs[Double]("p10_tokens")) <= 3.0)
      assert(math.abs(a50 - r.getAs[Double]("p50_tokens")) <= 3.0)
      assert(math.abs(a90 - r.getAs[Double]("p90_tokens")) <= 3.0)
      // counts/sums are exact in both variants
    }
  }
}
