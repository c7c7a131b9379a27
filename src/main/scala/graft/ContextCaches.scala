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
}
