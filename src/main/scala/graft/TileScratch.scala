package graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.SparkSession

/** Warehouse-filesystem scratch dirs for tiled kernels, deleted when
  * their SparkContext stops.
  *
  * Tiled block-scan operators (near-dup cosine pairs, tiled 1-NN) append
  * per-tile output straight from the executors and read it back lazily,
  * so the dirs must outlive the call that created them. Paths live on
  * the SAME filesystem Spark writes/reads through (warehouse dir →
  * defaultFS on a cluster): a driver-local java.io.tmpdir path would
  * silently scatter executor appends across local disks on a multi-node
  * cluster, and a java.nio cleanup would miss data written to
  * HDFS/object storage.
  */
object TileScratch {
  private val dirs = scala.collection.concurrent.TrieMap
    .empty[SparkContext, List[String]]
  private val nonce = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Create a fresh scratch dir and register it for on-stop deletion. */
  def newDir(s: SparkSession, prefix: String): String = {
    val root = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), "_graft_scratch")
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(root,
      s"$prefix-${s.sparkContext.applicationId}-${nonce.incrementAndGet()}")
    fs.mkdirs(dir)
    dirs.updateWith(s.sparkContext) {
      prev => Some(dir.toString :: prev.getOrElse(Nil))
    }
    ContextCaches.evictOnStop(s.sparkContext, "tile-scratch")(() => {
      val sc = s.sparkContext
      dirs.remove(sc).getOrElse(Nil).foreach(delete(sc, _))
    })
    dir.toString
  }

  private def delete(sc: SparkContext, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
