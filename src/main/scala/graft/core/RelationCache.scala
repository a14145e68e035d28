package graft.core

import java.lang.ref.SoftReference
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped relation METADATA cache shared by [[Tables]] and
  * IvfIndex.openRaw — the catalog role a real engine's metastore plays
  * (optimization guide §6). Holds only resolved, unevaluated relations
  * (file listing + schema — no data, no results); every execution
  * still scans the files. Each entry carries the caller's freshness
  * token and is validated per hit.
  *
  * Lifetime (ADVICE r15): the outer map is weakly keyed on the
  * SparkSession, but a cached DataFrame strongly references its
  * session, so holding the inner map strongly would pin every session
  * forever (WeakHashMap value→key retention). The inner map therefore
  * sits behind a SoftReference: the key→value→key cycle runs through a
  * reference the collector may clear, so under memory pressure (or
  * once soft refs age out) the cache empties and a stopped session
  * becomes collectible; the next access just re-resolves the relation.
  *
  * `spark.graft.relationCache.enabled=false` disables caching
  * entirely — the escape hatch for non-file schemes (s3://, hdfs://),
  * whose [[Tables.stamp]] freshness token is the constant (0, 0) and
  * which would otherwise serve a session-lifetime listing like a
  * remote catalog does. */
object RelationCache {
  private val bySession =
    new java.util.WeakHashMap[SparkSession,
      SoftReference[ConcurrentHashMap[String, (AnyRef, DataFrame)]]]()

  private def enabled(spark: SparkSession): Boolean =
    spark.conf.get("spark.graft.relationCache.enabled", "true").toBoolean

  /** The cached relation for `key` if its stored token equals `token`,
    * else `build` (cached for the next hit). `key` is namespaced by
    * the caller ("tbl:…", "ivfraw:…"). */
  def getOrBuild(spark: SparkSession, key: String, token: AnyRef)
      (build: => DataFrame): DataFrame = {
    if (!enabled(spark)) return build
    val m = bySession.synchronized {
      val ref = bySession.get(spark)
      val ex = if (ref == null) null else ref.get
      if (ex != null) ex
      else {
        val fresh = new ConcurrentHashMap[String, (AnyRef, DataFrame)]()
        bySession.put(spark, new SoftReference(fresh))
        fresh
      }
    }
    val hit = m.get(key)
    if (hit != null && hit._1 == token) hit._2
    else {
      val df = build
      m.put(key, (token, df))
      df
    }
  }
}
