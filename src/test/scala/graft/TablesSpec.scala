package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Preconditions for [[Tables.salesLite]]'s FK-informed join
  * elimination (r16): an inner join that contributes no columns is a
  * no-op iff it neither DROPS stream rows (no orphan lineitems) nor
  * DUPLICATES them (unique order keys). Both are the TPC-H referential
  * contract; assert them at every verified scale factor so a future
  * data drop that violates the contract fails HERE, loudly, instead of
  * silently diverging ~25 gold/athena/graph queries from their
  * join-through oracles. */
class TablesSpec extends SparkSpec {

  test("salesLite precondition: lineitem→orders FK + order-key uniqueness at every verified SF") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val li = Tables.table(spark, dir, "lineitem")
      val o = Tables.table(spark, dir, "orders")
      val dupKeys = o.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
        .where(col("c") > 1).count()
      assert(dupKeys == 0L, s"duplicate o_orderkey at $dir")
      val orphans = li.select("l_orderkey")
        .join(o.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti").count()
      assert(orphans == 0L, s"$orphans orphan lineitems at $dir")
    }
  }

  test("salesLite is sales minus customer_id, row for row") {
    val dir = "/root/testdata/sf0.01"
    val full = Tables.sales(spark, dir).drop("customer_id")
      .orderBy("transaction_id", "product_id").collect().map(_.toSeq).toSeq
    val lite = Tables.salesLite(spark, dir)
      .orderBy("transaction_id", "product_id").collect().map(_.toSeq).toSeq
    assert(lite.nonEmpty)
    assert(lite == full)
  }
}
