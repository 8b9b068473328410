package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime cache for TRAINED ARTIFACTS — small derived tables
  * (near-dup pair lists, the doc→cluster map, ANN top-k result tables)
  * that are expensive to derive but metadata-sized to hold, mirroring
  * the IVF/PQ codebook and BPE merge-table train-once contract: one
  * derivation per corpus per session, every later consumer reads the
  * materialized result. In a deployment each of these is persisted next
  * to the table (see [[Curation.saveClusterMap]]) and loaded, never
  * re-derived on the query path.
  *
  * Entries are `localCheckpoint`ed (materialized to executor storage,
  * lineage truncated), so a cached artifact costs one scan to reuse.
  * The outer map is WEAKLY keyed by the session OBJECT (never an
  * identity hash, which two live sessions can share): a cached
  * DataFrame can neither outlive nor leak past the session that
  * computed it — when the session is unreachable its entry map is
  * collected, and the `ContextCleaner` reclaims the checkpointed
  * blocks with the RDDs.
  */
private[graft] object ArtifactCache {

  /** session → (dir|name → artifact). WeakHashMap is not thread-safe:
    * all access goes through `sessions.synchronized`; per-session inner
    * maps are concurrent so builds never hold the outer lock. */
  private val sessions =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  private def forSession(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, DataFrame] =
    sessions.synchronized {
      var m = sessions.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        sessions.put(spark, m)
      }
      m
    }

  private def key(dir: String, name: String): String = s"$dir|$name"

  /** The cached artifact for (corpus dir, name), building + checkpointing
    * on first use. Deliberately NOT `computeIfAbsent`: builders may
    * themselves read other cached artifacts (the cluster map builds on
    * the near-dup pair list), and nested `computeIfAbsent` on one map is
    * a recursive-update error. */
  def of(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val m = forSession(spark)
    val k = key(dir, name)
    val hit = m.get(k)
    if (hit != null) hit
    else {
      val t0 = System.nanoTime()
      val built = build.localCheckpoint()
      buildSec.put(k, (System.nanoTime() - t0) / 1e9)
      val prev = m.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  /** Wall seconds of each artifact's FIRST derivation this JVM (key =
    * "dir|name"). Observability only (r15 VERDICT #2): cached-consumer
    * bench minima are warm-path numbers by the train-once contract, and
    * this map is what lets a reader separate the one-off corpus-sized
    * derivation cost from the per-query cost — Bench emits it as
    * `artifact_build_sec`. */
  private val buildSec =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** Snapshot of every first-derivation time recorded so far. */
  def buildSeconds: Map[String, Double] = {
    val b = Map.newBuilder[String, Double]
    buildSec.forEach((k, v) => b += (k -> v.doubleValue()))
    b.result()
  }

  /** Prime the cache with an externally persisted artifact (the load
    * half of a save/load contract). */
  def put(spark: SparkSession, dir: String, name: String,
      df: DataFrame): Unit =
    forSession(spark).put(key(dir, name), df)

  /** Drop ONE cached artifact. Prefer [[invalidateDir]] after a corpus
    * rewrite: artifacts of one dir derive from each other (the cluster
    * map builds on the ngram pair list), so dropping one name while its
    * upstreams stay cached silently re-derives it from stale inputs. */
  def invalidate(spark: SparkSession, dir: String, name: String): Unit =
    forSession(spark).remove(key(dir, name))

  /** Drop EVERY cached artifact of a corpus dir rewritten in place —
    * the one safe invalidation granularity, since artifacts of a dir
    * form a derivation chain. */
  def invalidateDir(spark: SparkSession, dir: String): Unit = {
    val m = forSession(spark)
    val it = m.keySet().iterator()
    while (it.hasNext) if (it.next().startsWith(s"$dir|")) it.remove()
  }
}
