package graft

import org.apache.spark.sql.functions._
import graft.operators.ArtifactCache

/** Direct contract tests for the trained-artifact cache — the
  * consumers' no-recompute proofs live with their operators
  * (CurationSpec, SimilaritySpec, FuzzyMatchSpec); this pins the cache
  * semantics themselves: build-once, put-override, name- and dir-level
  * invalidation. */
class ArtifactCacheSpec extends SparkSpec {

  test("of() builds once per (dir, name) and serves the checkpoint after") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq((1L, "a")).toDF("k", "v") }
    val dir = "/cache-spec/corpus-a"
    val first = ArtifactCache.of(spark, dir, "t1")(build())
    ArtifactCache.of(spark, dir, "t1")(build())
    val again = ArtifactCache.of(spark, dir, "t1")(build())
    assert(builds == 1, "builder re-ran on a warm key")
    assert(again.collect().toSeq == first.collect().toSeq)
    // the served plan is the materialized checkpoint, not the lineage
    assert(again.queryExecution.executedPlan.toString.contains("ExistingRDD"))
    // a different name under the same dir builds independently
    ArtifactCache.of(spark, dir, "t2")(build())
    assert(builds == 2)
  }

  test("invalidateDir drops every artifact of the dir and nothing else") {
    import spark.implicits._
    val (da, db) = ("/cache-spec/corpus-b", "/cache-spec/corpus-c")
    var builds = 0
    def build() = { builds += 1; Seq((builds.toLong, "x")).toDF("k", "v") }
    ArtifactCache.of(spark, da, "pairs")(build())
    ArtifactCache.of(spark, da, "map")(build())
    ArtifactCache.of(spark, db, "pairs")(build())
    assert(builds == 3)
    ArtifactCache.invalidateDir(spark, da)
    // both of da's artifacts re-derive (the derivation-chain contract:
    // a corpus rewrite may never leave a downstream artifact cached
    // against stale upstreams) ...
    ArtifactCache.of(spark, da, "pairs")(build())
    ArtifactCache.of(spark, da, "map")(build())
    assert(builds == 5)
    // ... while the other dir's stays warm
    ArtifactCache.of(spark, db, "pairs")(build())
    assert(builds == 5)
  }

  test("put overrides the cached artifact (the load half of persist/load)") {
    import spark.implicits._
    val dir = "/cache-spec/corpus-d"
    ArtifactCache.of(spark, dir, "t")(Seq((1L, "old")).toDF("k", "v"))
    val loaded = Seq((2L, "new")).toDF("k", "v").localCheckpoint()
    ArtifactCache.put(spark, dir, "t", loaded)
    val got = ArtifactCache.of(spark, dir, "t")(
      sys.error("builder must not run after put"))
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "new")))
  }
}
