package graft

import org.apache.spark.sql.DataFrame
import graft.operators._

/** Physical-plan shape assertions for the round-4 operators — the
  * scale contract (broadcasts where intended, no cartesian products, no
  * unpartitioned windows) enforced in CI so a silent plan regression
  * fails the suite, not a cluster. */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def assertSane(p: String): Unit = {
    assert(!p.contains("CartesianProduct"), p.take(500))
    // an unpartitioned window funnels everything through one partition:
    // every Window node in these plans must carry a partition spec
    p.split("\n").filter(_.contains("windowspecdefinition(")).foreach { l =>
      // windowspecdefinition(partCol, ..., orderCol ASC ...) — an empty
      // partition list would start with the order spec directly
      assert(!l.contains("windowspecdefinition(_w"),
        s"unpartitioned window: $l")
    }
  }

  test("semantic decontam: keyed candidate join, no cartesian, no global window") {
    val p = plan(Similarity.semanticDecontam(spark, sfDir))
    assertSane(p)
  }

  test("rfm: quintile edges ride 1-row broadcasts, no window, no cartesian") {
    val p = plan(Gold.rfmSegments(spark, sfDir))
    assertSane(p)
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("Window"), "NTILE-style window snuck in")
  }

  test("winsorize + robust anomalies: broadcast bounds, no window") {
    Seq(Events.winsorize(spark, sfDir),
      Events.robustAnomalies(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assertSane(p)
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"))
      assert(!p.contains("Window"))
    }
  }

  test("attribution, transitions, user paths: sane windows, broadcast totals") {
    Seq(Events.attribution(spark, sfDir),
      Events.transitions(spark, sfDir),
      Events.userPaths(spark, sfDir)).foreach(df => assertSane(plan(df)))
    // transitions' per-row totals join is broadcast (a #types-row side)
    assert(plan(Events.transitions(spark, sfDir)).contains("BroadcastHashJoin"))
  }

  test("temperature sampling: allocation and totals broadcast, no source window") {
    val p = plan(Curation.temperatureSample(spark, sfDir))
    assertSane(p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("oov scoring: vocab joins broadcast; drift: totals broadcast") {
    Seq(TextAnalysis.oovScore(spark, sfDir),
      DataQuality.drift(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assertSane(p)
      assert(p.contains("BroadcastHashJoin"))
    }
  }

  test("canonical selection and cdc apply: no cartesian, no global window") {
    Seq(Curation.canonicalByQuality(spark, sfDir),
      Silver.cdcApplyCustomers(spark, sfDir),
      Athena.monthUnpivot(spark, sfDir)).foreach(df => assertSane(plan(df)))
  }

  test("abc / gini / streaks / containment: partitioned scans, broadcast offsets") {
    Seq(Gold.abcClass(spark, sfDir),
      Events.activityGini(spark, sfDir),
      Events.streaks(spark, sfDir),
      Dedup.containment(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assertSane(p)
    }
    // the two global-cumsum rewrites must broadcast their offset tables
    Seq(Gold.abcClass(spark, sfDir), Events.activityGini(spark, sfDir))
      .foreach { df =>
        assert(plan(df).contains("BroadcastHashJoin"), "offsets not broadcast")
      }
  }

  test("round-5 retail ops: broadcast dims/totals, no window, no cartesian") {
    Seq(Gold.returnsByCategory(spark, sfDir),
      Gold.discountImpact(spark, sfDir),
      Gold.seasonality(spark, sfDir),
      Gold.marketShare(spark, sfDir),
      Events.hourlyProfile(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assertSane(p)
      assert(p.contains("BroadcastHashJoin"), "dim/totals join not broadcast")
      assert(!p.contains("Window"), "no window belongs in these rollups")
    }
    // pure-histogram/summary passes: single aggregate, no join at all
    Seq(Gold.orderValueHistogram(spark, sfDir),
      Athena.pricingSummary(spark, sfDir),
      TextAnalysis.freqSpectrum(spark, sfDir)).foreach { df =>
      val p = plan(df)
      assertSane(p)
      assert(!p.contains("Join"), "histogram rollups must not join")
      assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    }
    // co-partitioned fact⋈fact checks shuffle on the SAME key they
    // aggregate on (one exchange family, no broadcast of the fact)
    Seq(Athena.priorityFulfillment(spark, sfDir),
      DataQuality.orderReconciliation(spark, sfDir)).foreach { df =>
      assertSane(plan(df))
    }
    // trending: bounded-heap top-k, never a per-day rank window
    val t = plan(Events.trendingItems(spark, sfDir))
    assertSane(t)
    assert(!t.contains("Window"), "trending must use the bounded heap")
    assert(t.toLowerCase.contains("topk"), "bounded-heap aggregate missing")
  }

  test("round-6 ops: broadcast marginals, no cartesian, silhouette joins nothing") {
    Seq(Events.powerCurve(spark, sfDir),
      Events.typeCooccurrence(spark, sfDir),
      Events.seasonalBaseline(spark, sfDir),
      Gold.inventoryTurnover(spark, sfDir),
      Gold.assortmentOverlap(spark, sfDir),
      DataQuality.nullProfile(spark, sfDir),
      DataQuality.keyProfile(spark, sfDir),
      Graph.edgeJaccard(spark, sfDir)).foreach(df => assertSane(plan(df)))
    // marginal/total joins ride broadcasts
    Seq(Events.typeCooccurrence(spark, sfDir),
      Gold.assortmentOverlap(spark, sfDir)).foreach { df =>
      assert(plan(df).contains("BroadcastHashJoin"), "marginals not broadcast")
    }
    // silhouette is a pure projection + label-catalog aggregate: the
    // centroid codebook enters as literals, never a join
    val s = plan(Similarity.labelSilhouette(spark, sfDir))
    assertSane(s)
    assert(!s.contains("Join"), "silhouette must not join the centroid table")
    // null profile: one agg pass per table, no join anywhere
    assert(!plan(DataQuality.nullProfile(spark, sfDir)).contains("Join"))
    // power curve: the global rank is the range-partitioned prefix scan
    assert(plan(Events.powerCurve(spark, sfDir)).toLowerCase
      .contains("rangepartitioning"), "prefix scan missing its range exchange")
  }

  test("negative-space window audit: every Window in every committed plan is entity-partitioned") {
    // The whole-surface complement of the per-operator checks above: NO
    // committed query may carry a Window partitioned on a key where one
    // group can grow with the corpus (event_type, lang, store, category,
    // date, cluster-catalog keys …) — such a window funnels a data-sized
    // group through ONE task at 100 TB (the failure mode SkewUtils
    // prefixSum/groupRank exist to avoid). Allowed partition keys are
    // per-ENTITY (one user's events, one document's tokens/chunks/shingle
    // spans, one near-dup cluster, one SKU's co-purchases, one compaction
    // output bin — all bounded by per-entity activity, not corpus size)
    // plus __psum_pid, prefixSum's ≤shuffle-partitions range-partition id.
    // Run `sbt "runMain graft.WindowAudit"` to regenerate the inventory
    // after a REVIEWED change adds a window.
    val allowedKeys = Set(
      "user_id",              // per-user event history
      "customer_id",          // per-customer order history
      "doc_id",               // per-document tokens/chunks/spans
      "cluster_id",           // per-near-dup-cluster members
      "sku",                  // per-product co-purchase neighbors
      "d_key",                // per-golden-record duplicate group
      "part",                 // per-compaction-bin files
      "event_type+user_id",   // per-(user,type) gap series
      "__psum_pid")           // prefixSum partition offsets, ≤ P rows
    // The ONE global window: txt_vocab's id assignment runs AFTER a
    // LIMIT VocabK, so its single-partition sort is O(k constant), never
    // O(corpus) (see TextAnalysis.vocab's scale-shape scaladoc).
    val globalOk = Set("txt_vocab")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      WindowAudit.windowShapes(fn(spark, sfDir)).foreach { shape =>
        if (shape == "(global)")
          assert(globalOk(name), s"$name: UNPARTITIONED window")
        else
          assert(allowedKeys(shape),
            s"$name: window partitioned on unreviewed key set '$shape'")
      }
    }
  }
}
