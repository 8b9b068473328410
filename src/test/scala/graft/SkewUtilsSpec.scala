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
