package graft

import graft.operators.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction plan packs greedily: full groups reach the target") {
    import spark.implicits._
    val files = Seq(
      ("p1", 0L, 10L), ("p1", 1L, 10L), ("p1", 2L, 10L), ("p1", 3L, 10L),
      ("p2", 0L, 100L), ("p2", 1L, 1L)).toDF("part", "file_id", "bytes")
    val plan = Compaction.compactionPlan(files, 25L).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    // p1: cum-before 0,10,20,30 → groups 0,0,0,1
    assert(plan(("p1", 0L)) == 0 && plan(("p1", 1L)) == 0)
    assert(plan(("p1", 2L)) == 0 && plan(("p1", 3L)) == 1)
    // p2: an oversized first file closes its group immediately
    assert(plan(("p2", 0L)) == 0 && plan(("p2", 1L)) == 4)
  }

  test("compaction plan equals the pure prefix-sum reference on random inventories") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val files = for {
      p <- 0 until 5
      f <- 0 until rnd.nextInt(40) + 2
    } yield (s"p$p", f.toLong, (rnd.nextInt(5000) + 1).toLong)
    val target = 8192L
    val got = Compaction.compactionPlan(
        files.toDF("part", "file_id", "bytes"), target).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getInt(3)).toMap
    val expected = files.groupBy(_._1).flatMap { case (p, fs) =>
      val sorted = fs.sortBy(_._2)
      val prefix = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(prefix).map { case ((_, f, _), cum) =>
        (p, f) -> (cum / target).toInt
      }
    }
    assert(got == expected)
  }

  test("lake compaction groups are contiguous and sized to the target") {
    val out = Compaction.lakeCompaction(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.get(0)).values.foreach { files =>
      val sorted = files.sortBy(_.getLong(1))
      // groups are non-decreasing down the file order (contiguity)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getInt(3) <= b.getInt(3))
        case _ =>
      }
      // the compaction guarantee: group count <= ceil(total/target),
      // i.e. output files average >= target size
      val total = sorted.map(_.getLong(2)).sum
      val nGroups = sorted.map(_.getInt(3)).distinct.length
      assert(nGroups <= (total + Compaction.TargetBytes - 1) / Compaction.TargetBytes)
    }
  }
}
