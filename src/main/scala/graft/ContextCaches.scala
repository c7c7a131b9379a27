package graft

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}

/** Shared eviction hook for context-keyed caches (dedup corpus
  * broadcasts, trained IVF centroids, ...): registers at most one
  * listener per (context, cache-name) and runs the supplied eviction
  * when the context stops, so no cache entry — or the stopped
  * SparkContext it is keyed by — outlives the application.
  */
object ContextCaches {
  private val hooked = scala.collection.concurrent.TrieMap
    .empty[(SparkContext, String), Unit]

  def evictOnStop(sc: SparkContext, cacheName: String)(evict: () => Unit): Unit =
    hooked.getOrElseUpdate((sc, cacheName), {
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evict()
          hooked.remove((sc, cacheName))
        }
      })
    })

  private val pinned = scala.collection.concurrent.TrieMap
    .empty[SparkContext,
      Map[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        org.apache.spark.sql.DataFrame]]

  /** `df.persist()` with a release path: the pin is registered against
    * the owning SparkContext and unpersisted when the context stops, so
    * no query-internal cache entry outlives the application. Within a
    * session, Spark's CacheManager dedups identical plans, so repeated
    * invocations of the same query on the same dir share one entry; the
    * driver-side registry mirrors that by keying on the canonicalized
    * analyzed plan — re-pinning a semantically identical frame replaces
    * the entry instead of appending, so the registry only grows with
    * genuinely distinct plans (new data dirs, novel ad-hoc datasets),
    * each of which the caller wanted resident.
    */
  def pin(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sc = df.sparkSession.sparkContext
    df.persist()
    val key = df.queryExecution.analyzed.canonicalized
    pinned.updateWith(sc)(p => Some(p.getOrElse(Map.empty) + (key -> df)))
    evictOnStop(sc, "pinned-plans")(() =>
      pinned.remove(sc).getOrElse(Map.empty).values.foreach(_.unpersist()))
    df
  }
}
