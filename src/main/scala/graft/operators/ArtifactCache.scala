package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime cache for TRAINED ARTIFACTS — small derived tables
  * (near-dup pair lists, the doc→cluster map) that are expensive to
  * derive but metadata-sized to hold, mirroring the IVF/PQ codebook and
  * BPE merge-table train-once contract: one derivation per corpus per
  * session, every later consumer reads the materialized result. In a
  * deployment each of these is persisted next to the table
  * (see [[Curation.saveClusterMap]]) and loaded, never re-derived on
  * the query path.
  *
  * Entries are `localCheckpoint`ed (materialized to executor storage,
  * lineage truncated), so a cached artifact costs one scan to reuse —
  * and the keys include the session identity, so a cached DataFrame can
  * never outlive the session that computed it.
  */
private[graft] object ArtifactCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def key(spark: SparkSession, dir: String, name: String): String =
    s"${System.identityHashCode(spark)}|$dir|$name"

  /** The cached artifact for (corpus dir, name), building + checkpointing
    * on first use. Deliberately NOT `computeIfAbsent`: builders may
    * themselves read other cached artifacts (the cluster map builds on
    * the near-dup pair list), and nested `computeIfAbsent` on one map is
    * a recursive-update error. */
  def of(spark: SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val k = key(spark, dir, name)
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      val built = build.localCheckpoint()
      val prev = cache.putIfAbsent(k, built)
      if (prev != null) prev else built
    }
  }

  /** Prime the cache with an externally persisted artifact (the load
    * half of a save/load contract). */
  def put(spark: SparkSession, dir: String, name: String,
      df: DataFrame): Unit =
    cache.put(key(spark, dir, name), df)

  /** Drop a cached artifact for a corpus dir rewritten in place. */
  def invalidate(spark: SparkSession, dir: String, name: String): Unit =
    cache.remove(key(spark, dir, name))
}
