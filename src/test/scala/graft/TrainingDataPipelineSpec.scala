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
    // ...and the soft-dedup weighting signal: the per-doc duplicated-
    // text share, matching the standalone operator exactly
    val cov = graft.operators.Dedup.dupCoverage(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("dup_ratio")).toMap
    m.foreach { r =>
      assert(r.getAs[Double]("dup_ratio") == cov(r.getAs[Long]("doc_id")))
    }
    // no survivor carries verbatim benchmark text at either granularity
    val charClean = graft.operators.Dedup.decontamSubstr(spark, sfDir)
      .where(!col("contaminated")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    m.foreach(r => assert(charClean.contains(r.getAs[Long]("doc_id"))))
    // no survivor trips the Gopher top-gram occupancy rule
    val tg = graft.operators.TextAnalysis.topgramShare(spark, sfDir)
      .where(!col("flagged")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    m.foreach(r => assert(tg.contains(r.getAs[Long]("doc_id"))))
    // ...and the host-prior weighting signal matches the standalone op
    val hw = graft.operators.Curation.hostWeighted(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("weight")).toMap
    m.foreach { r =>
      assert(r.getAs[Double]("host_weight") == hw(r.getAs[Long]("doc_id")))
    }
  }

  test("second batch ingests against the first run's persisted signatures, no recompute") {
    import spark.implicits._
    val r = TrainingDataPipeline.run(spark, sfDir, tmpBase())
    val docs = graft.sources.Tables.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    val survivors = spark.read.parquet(r.manifestPath).select("doc_id")
    val corpus = docs.join(survivors, Seq("doc_id"), "left_semi")
    // batch: one exact copy of a curated doc (must be screened out) and
    // one genuinely novel document (must be admitted)
    val srcRow = corpus.orderBy("doc_id").head()
    val srcId = srcRow.getLong(0)
    val novelText = "completely unprecedented prose about cerulean walrus " +
      "accordions orbiting a bespoke marzipan observatory nobody indexed"
    val batch = Seq(
      (900000001L, srcRow.getString(1)),
      (900000002L, novelText),
      (900000003L, novelText)) // exact in-batch copy: only the first lands
      .toDF("doc_id", "text")
    val screen = graft.operators.Dedup
      .screenAgainstIndex(spark, batch, corpus, r.sigIndexPath)
      .collect().map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(screen(900000001L) == false, "planted duplicate not caught")
    assert(screen(900000002L) == true, "novel doc wrongly flagged")
    assert(screen(900000003L) == true, "corpus screen is batch-vs-corpus only")
    // the composed verdict: corpus dup rejected, in-batch dup rejected
    // with the first copy as witness, one admitted survivor
    val verdict = TrainingDataPipeline
      .admissionVerdict(spark, batch, corpus, r.sigIndexPath)
      .collect().map(v => v.getAs[Long]("doc_id") -> v).toMap
    assert(!verdict(900000001L).getAs[Boolean]("admitted"))
    assert(verdict(900000002L).getAs[Boolean]("admitted"))
    assert(!verdict(900000003L).getAs[Boolean]("admitted"))
    assert(verdict(900000003L).getAs[Boolean]("exact_dup_in_batch"))
    assert(verdict(900000003L).getAs[Long]("first_batch_id") == 900000002L)
    val admitted = TrainingDataPipeline
      .ingestBatch(spark, batch, corpus, r.sigIndexPath)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(900000002L))
    // NO-RECOMPUTE proof (the codebook no-retrain pattern): scramble
    // every corpus text except the candidate source doc. If the screen
    // re-derived corpus signatures from corpusDocs, the scrambled texts
    // would bucket differently and the planted dup would go undetected;
    // it is still caught → the candidate join used the PERSISTED index,
    // and corpus text was only read for candidate docs.
    val scrambled = corpus.select(col("doc_id"),
      when(col("doc_id") === srcId, col("text"))
        .otherwise(concat(lit("scrambled "), xxhash64(col("text")).cast("string")))
        .as("text"))
    val screen2 = graft.operators.Dedup
      .screenAgainstIndex(spark, batch, scrambled, r.sigIndexPath)
      .collect().map(x => x.getLong(0) -> x.getBoolean(3)).toMap
    assert(screen2(900000001L) == false,
      "dup missed against scrambled corpus: screen recomputed signatures")
    assert(screen2(900000002L) == true)
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
