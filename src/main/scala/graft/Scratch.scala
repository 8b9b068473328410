package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement probe — not part of the build deliverable. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkConfigs.local(SparkSession.builder(),
      SparkConfigs.cpusFromEnv(32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.SimHashWide.register(spark)
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
    val n = docs.count()
    val lanes = graft.operators.Dedup.simhashLanesFor(n)
    println(s"docs=$n lanes=$lanes")
    val blockBits = 64 * lanes / 8
    val sig = docs.select(col("doc_id"),
      call_function("graft_simhash_wide", col("text"), lit(lanes)).as("simhash"))
    def blockValue(b: Int) = {
      val bitPos = b * blockBits
      val laneCol = element_at(col("simhash"), lit(bitPos / 64 + 1))
      if (blockBits == 64) laneCol
      else shiftright(laneCol, bitPos % 64).bitwiseAND(lit((1L << blockBits) - 1))
    }
    val blocks = sig.select(col("doc_id"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("blk"), blockValue(b).as("v"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.blk").as("blk"), col("bk.v").as("v"))
    val pops = blocks.groupBy("blk", "v").agg(count(lit(1)).as("pop"))
    println("top-20 buckets:")
    pops.orderBy(desc("pop")).limit(20).collect().foreach(println)
    val stats = pops.agg(count(lit(1)).as("n_buckets"),
      sum(col("pop") * col("pop")).as("sum_pop2"),
      sum(when(col("pop") > 512, col("pop")).otherwise(0L)).as("hot_rows"),
      sum(when(col("pop") > 512, col("pop") * col("pop")).otherwise(0L)).as("hot_pop2"),
      max("pop").as("max_pop")).collect()(0)
    println(s"stats: $stats")
    spark.stop()
  }
}
