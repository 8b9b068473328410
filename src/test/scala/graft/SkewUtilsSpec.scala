package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewUtils
import graft.sources.Tables

class SkewUtilsSpec extends SparkSpec {

  test("spread count-distinct equals direct countDistinct") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val spread = SkewUtils.countDistinctSpread(li, "l_suppkey", "l_partkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = li.groupBy("l_suppkey")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spread == direct)
  }

  test("spread count-distinct ignores NULL values like COUNT(DISTINCT)") {
    import spark.implicits._
    val df = Seq((1L, Some(10L)), (1L, None), (1L, Some(10L)), (2L, None))
      .toDF("k", "v")
    val spread = SkewUtils.countDistinctSpread(df, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spread == Map(1L -> 1L, 2L -> 0L))
  }

  test("salted join equals direct join") {
    val li = Tables.table(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val orders = Tables.table(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_custkey"))
    val direct = li.join(orders, "l_orderkey")
    val salted = SkewUtils.saltedJoin(li, orders, "l_orderkey", buckets = 8)
    assert(salted.count() == direct.count())
    val a = salted.agg(sum("l_quantity"), sum("o_custkey")).head
    val b = direct.agg(sum("l_quantity"), sum("o_custkey")).head
    assert(a == b)
  }

  test("prefixSum equals the single-window global cumsum (asc, desc, rank)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // ties in x are the interesting case: the tiebreaker k decides order
    val df = Seq((3L, "a"), (1L, "b"), (3L, "c"), (2L, "d"), (1L, "e"),
      (2L, "f"), (3L, "g")).toDF("x", "k")
    def naive(order: Seq[org.apache.spark.sql.Column],
        w: org.apache.spark.sql.Column) =
      df.withColumn("cum", sum(w).over(Window.orderBy(order: _*)))
        .select("k", "cum").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def scanned(order: Seq[org.apache.spark.sql.Column],
        w: org.apache.spark.sql.Column) =
      SkewUtils.prefixSum(df, order, w, "cum")
        .select("k", "cum").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val asc = Seq(col("x").asc, col("k").asc)
    val desc = Seq(col("x").desc, col("k").asc)
    assert(scanned(asc, col("x")) == naive(asc, col("x")))
    assert(scanned(desc, col("x")) == naive(desc, col("x")))
    // weight 1 = exact global rank
    assert(scanned(asc, lit(1L)) == naive(asc, lit(1L)))
  }

  test("prefixSum range partitions stay balanced on a 99%-tied corpus") {
    import spark.implicits._
    // the distribution that collapses value-space bucketing: 99% of rows
    // share ONE value (every 1-event user in a Gini rank, every clipped
    // quality score). The range partitioner must split the tie across
    // partitions on the unique tiebreaker.
    val n = 20000
    val df = (1 to n)
      .map(i => (if (i % 100 == 0) i.toLong else 7L, f"k$i%06d"))
      .toDF("x", "k")
    val p = spark.sessionState.conf.numShufflePartitions
    val pops = df.repartitionByRange(p, col("x").asc, col("k").asc)
      .groupBy(spark_partition_id().as("pid")).count()
      .collect().map(_.getAs[Long]("count"))
    assert(pops.length == p, s"expected $p non-empty partitions, got ${pops.length}")
    assert(pops.max <= 2L * n / p,
      s"skewed range partition: max=${pops.max} vs bound ${2L * n / p}")
    // and the cum over that corpus is still the exact global cumsum
    val cum = SkewUtils.prefixSum(df, Seq(col("x").asc, col("k").asc),
      col("x"), "cum")
    val last = cum.orderBy(col("cum").desc).select("cum").head.getLong(0)
    val total = df.agg(sum("x")).head.getLong(0)
    assert(last == total)
  }

  test("prefixSum equals the window cumsum on seeded random datasets") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 500 + rnd.nextInt(1500)
      // heavy ties in x by design (nextInt(20)); k unique
      val data = (1 to n).map(i =>
        (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(1000).toLong))
      val df = data.toDF("x", "k", "w")
      Seq(Seq(col("x").asc, col("k").asc),
        Seq(col("x").desc, col("k").asc)).foreach { ord =>
        val expect = df.withColumn("cum", sum(col("w")).over(Window.orderBy(ord: _*)))
          .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
        val got = SkewUtils.prefixSum(df, ord, col("w"), "cum")
          .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cum")).toMap
        assert(got == expect, s"trial $trial, order $ord")
      }
    }
  }

  test("groupRank equals the per-group row_number window, incl. one mega-group") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 99% of rows in ONE group — the distribution that breaks the
    // window formulation's per-group partition
    val n = 5000
    val df = (1 to n)
      .map(i => (if (i % 100 == 0) s"s${i % 7}" else "mega", f"k$i%05d"))
      .toDF("g", "k")
    val expect = df.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val got = SkewUtils.groupRank(df, "g", Seq(col("k").asc), "rn")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("k")) ->
        r.getAs[Long]("rn")).toMap
    assert(got.size == expect.size)
    expect.foreach { case (k, v) => assert(got(k) == v.toLong, s"$k") }
  }

  test("groupRank equals the window on a MANY-group catalog (offsets scale in G)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // thousands of distinct groups, a handful of rows each — the
    // catalog shape whose strictly-lower-population offsets must ride
    // the range-partitioned prefix scan (a G² non-equi self-join here
    // would be 16M pairs from 4k groups and unusable at a real
    // user_id catalog)
    val df = (1 to 12000)
      .map(i => (f"g${i % 4000}%05d", f"k$i%05d"))
      .toDF("g", "k")
    val expect = df.withColumn("rn",
        row_number().over(Window.partitionBy("g").orderBy("k")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    val got = SkewUtils.groupRank(df, "g", Seq(col("k").asc), "rn")
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[String]("k")) ->
        r.getAs[Long]("rn")).toMap
    assert(got.size == expect.size)
    expect.foreach { case (k, v) => assert(got(k) == v.toLong, s"$k") }
  }

  test("salted sum equals direct sum") {
    val li = Tables.table(spark, sfDir, "lineitem")
    val salted = SkewUtils.saltedSum(li, "l_partkey", "l_quantity", buckets = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = li.groupBy("l_partkey").agg(sum("l_quantity").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(salted.keySet == direct.keySet)
    assert(salted.forall { case (k, v) => math.abs(v - direct(k)) < 1e-9 })
  }
}
