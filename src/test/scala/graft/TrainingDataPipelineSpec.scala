package graft

import org.apache.spark.sql.functions._

class TrainingDataPipelineSpec extends SparkSpec {

  private def tmpBase(): String =
    java.nio.file.Files.createTempDirectory("graft_tdp").toString

  test("curation pipeline runs end-to-end; stages shrink monotonically; gate passes") {
    val r = TrainingDataPipeline.run(spark, sfDir, tmpBase())
    val counts = r.stageCounts
    assert(counts.head._1 == "ingest" && counts.head._2 == 500)
    counts.sliding(2).foreach { case Seq((_, a), (n, b)) =>
      assert(b <= a, s"stage $n grew: $a -> $b")
    }
    // each filter bites at this sf: strictly fewer docs after curation
    assert(counts.last._2 < counts.head._2)
    assert(r.dqPassed, counts.toString)
    // manifest matches the final frontier and is shuffle-ordered
    val m = spark.read.parquet(r.manifestPath).collect()
    assert(m.length == counts.last._2)
    val keys = m.map(r => (r.getAs[Long]("shuffle_key"), r.getAs[Long]("doc_id")))
    assert(keys.sortBy(identity).sameElements(keys) ||
      keys.sorted.sameElements(keys))
    // survivors all pass the ensemble gate and the boilerplate budget
    val q = graft.operators.TextAnalysis.qualityEnsemble(spark, sfDir)
      .where(col("keep")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    m.foreach(r => assert(q.contains(r.getAs[Long]("doc_id"))))
    val rep = graft.operators.TextAnalysis.stripRepeats(spark, sfDir)
      .where(col("removed_fraction") <= TrainingDataPipeline.MaxRemovedFrac)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    m.foreach(r => assert(rep.contains(r.getAs[Long]("doc_id"))))
    // the manifest carries a leakage-safe CV fold for every survivor
    m.foreach { r =>
      val f = r.getAs[Long]("fold")
      assert(f >= 0 && f < graft.operators.Curation.KFolds)
    }
  }

  test("curation pipeline is deterministic across runs") {
    val a = TrainingDataPipeline.run(spark, sfDir, tmpBase())
    val b = TrainingDataPipeline.run(spark, sfDir, tmpBase())
    assert(a.stageCounts == b.stageCounts)
    val ma = spark.read.parquet(a.manifestPath).orderBy("shuffle_key", "doc_id")
      .collect().toSeq
    val mb = spark.read.parquet(b.manifestPath).orderBy("shuffle_key", "doc_id")
      .collect().toSeq
    assert(ma == mb)
  }
}
