package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert sink for micro-batches — the streaming mirror of the
  * reference's replace-or-append table protocol (scripts/etl_turbofan.py:
  * 119-121) upgraded to merge semantics: new rows replace existing rows
  * with the same key instead of duplicating them.
  *
  * Implementation is copy-on-write over parquet, the same mechanism a
  * table format (Delta/Iceberg) uses under MERGE: read the current
  * snapshot, anti-join out the keys present in the batch, union the
  * batch, write the next snapshot, then swap directories. The swap is
  * delete+rename — NOT atomic (a concurrent reader can race the
  * window); a real table format commits via an atomic
  * metadata-pointer flip instead, which is the production upgrade
  * path. At 100 TB the table would be partitioned and only partitions
  * touched by the batch's keys rewritten (dynamic partition
  * overwrite).
  */
object UpsertSink {

  /** Merge `batch` into the keyed parquet table at `tablePath`. */
  def upsert(batch: DataFrame, tablePath: String, keyCol: String): Unit = {
    val spark = batch.sparkSession
    val cur = new org.apache.hadoop.fs.Path(tablePath)
    // Resolve the PATH's filesystem, not fs.defaultFS — a tablePath on
    // a different scheme (s3a:// vs hdfs://) would otherwise throw
    // "Wrong FS" from exists/delete/rename.
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(tablePath + ".next")
    // A batch with duplicate keys would write BOTH rows and permanently
    // violate key uniqueness — collapse to one row per key first. The
    // pick among intra-batch duplicates is arbitrary (like Delta MERGE,
    // deterministic last-writer-wins needs a version column upstream).
    val source = batch.dropDuplicates(Seq(keyCol))
    // Recover from a crash between a previous delete and rename: a
    // COMPLETE stranded .next dir (_SUCCESS present, i.e. the parquet
    // job committed) is the fully-written next snapshot — finish its
    // swap before merging, instead of silently reading an empty table.
    if (!fs.exists(cur) &&
        fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
      require(fs.rename(tmp, cur), s"recovery rename $tmp -> $cur failed")
    val merged =
      if (fs.exists(cur)) {
        val existing = spark.read.parquet(tablePath)
        existing.join(source.select(keyCol), Seq(keyCol), "left_anti")
          .unionByName(source)
      } else source
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // delete/rename report failure via their return value, not an
    // exception — unchecked, a failed swap would silently strand the new
    // snapshot in .next and leave the table missing.
    if (fs.exists(cur))
      require(fs.delete(cur, true), s"delete of old snapshot $cur failed")
    require(fs.rename(tmp, cur), s"rename $tmp -> $cur failed")
  }

  /** Partition-scoped upsert — the 100 TB shape the plain [[upsert]]
    * documents as its upgrade path: only partitions containing the
    * batch's keys are rewritten (Spark's dynamic partition overwrite),
    * untouched partition directories are left byte-identical. The merged
    * frame is localCheckpoint-ed before the write because Spark (rightly)
    * refuses to overwrite a path its own plan is still reading from;
    * the materialized state is bounded by the touched partitions, not
    * the table.
    *
    * A key may MOVE partitions between batches: by default a key-locator
    * pass (a column-pruned (key, partition) scan of the table,
    * semi-joined against the batch's keys) widens the touched set so the
    * old copy is dropped too. Callers whose keys never change partition
    * can skip that scan with `keysArePartitionStable = true` — then only
    * the batch's own partitions are read and rewritten.
    */
  def upsertPartitioned(batch: DataFrame, tablePath: String,
      keyCol: String, partCol: String,
      keysArePartitionStable: Boolean = false): Unit = {
    val spark = batch.sparkSession
    val cur = new org.apache.hadoop.fs.Path(tablePath)
    val fs = cur.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val source = batch.dropDuplicates(Seq(keyCol))
    if (!fs.exists(cur)) {
      source.write.partitionBy(partCol).parquet(tablePath)
      return
    }
    // Read the table through a session clone with partition-type
    // inference OFF: the partition column then comes back as the RAW
    // directory string (what Spark actually wrote), not a re-inferred
    // type whose re-rendering can differ from the original ("01" infers
    // to int 1, date-like strings to DateType, Timestamp toString grows
    // a ".0"). With raw strings on the table side and cast-to-string on
    // the batch side, every comparison and directory name lives in one
    // consistent domain — the same cast Spark's own partition-path
    // rendering uses.
    val noInfer = spark.newSession()
    noInfer.conf
      .set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
    // Crash recovery, mirroring upsert's stranded-.next heal: a previous
    // run that died between its dynamic overwrite and its
    // vacated-partition sweep leaves a stale directory whose old rows
    // duplicate moved keys. Moved keys only exist when keys are not
    // partition-stable, so the stable fast path skips the scan.
    if (!keysArePartitionStable)
      healVacatedPartitions(noInfer, fs, cur, tablePath, keyCol, partCol)
    val table = noInfer.read.parquet(tablePath)
    // Empty string and null both live in __HIVE_DEFAULT_PARTITION__ —
    // normalize "" to null so they are tracked as the one partition
    // they are.
    def partsOf(df: DataFrame): Seq[String] =
      df.select(col(partCol).cast("string")).distinct().collect()
        .map(r => if (r.isNullAt(0) || r.getString(0).isEmpty) null
          else r.getString(0)).distinct.toSeq
    val srcKeys = source.select(col(keyCol).as("__graft_k"))
    // Touched partitions: the batch's own, plus (unless the caller
    // vouches for partition-stable keys) every partition currently
    // holding one of the batch's keys — otherwise a moved key's stale
    // copy would survive in a partition this write never rewrites. Key
    // comparisons are null-safe so a null-keyed row is replaced, not
    // duplicated.
    val batchParts = partsOf(source)
    val staleParts =
      if (keysArePartitionStable) Seq.empty[String]
      else partsOf(table.join(srcKeys,
        col(keyCol) <=> col("__graft_k"), "left_semi"))
    val touched = (batchParts ++ staleParts).distinct
    val inTouched = {
      val nonNull = touched.filter(_ != null)
      val base = if (nonNull.isEmpty) lit(false)
        else col(partCol).cast("string").isInCollection(nonNull)
      if (touched.contains(null)) base || col(partCol).isNull else base
    }
    val merged = table.filter(inTouched)
      .join(srcKeys, col(keyCol) <=> col("__graft_k"), "left_anti")
      .unionByName(source)
      .localCheckpoint(true)
    merged.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(tablePath)
    // Dynamic overwrite only rewrites partitions PRESENT in the output:
    // a touched partition vacated by the merge (its only rows were moved
    // keys) would keep its stale directory — drop it explicitly.
    val remaining = partsOf(merged).toSet
    touched.filterNot(remaining.contains).foreach { v =>
      // getPartitionPathString handles null/empty → DEFAULT_PARTITION
      // and escapes both the column name and the value, matching the
      // directory Spark wrote.
      val dirName = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.getPartitionPathString(partCol, v)
      val p = new org.apache.hadoop.fs.Path(cur, dirName)
      if (fs.exists(p)) require(fs.delete(p, true),
        s"delete of vacated partition $p failed")
    }
  }

  /** Detect and delete stale vacated-partition directories left by a
    * crashed [[upsertPartitioned]] (died after its dynamic overwrite,
    * before its vacated-dir sweep). Such a directory is recognizable
    * without any journal: the crashed run vacated it because the merge
    * moved ALL of its keys elsewhere, so after the crash every one of
    * its keys also exists in another partition. A healthy keyed table
    * has unique keys, so no partition looks like that in normal
    * operation; the detection pass is one column-pruned (key, partition)
    * aggregate and finds nothing. When the batch moved every key of P
    * into one fresh partition Q, P and Q mirror each other and BOTH
    * qualify — candidates are therefore processed oldest-directory
    * first, each re-checked against the not-yet-deleted remainder, so
    * the stale (older) copy goes and the surviving copy then fails the
    * check and stays.
    */
  private def healVacatedPartitions(noInfer: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, cur: org.apache.hadoop.fs.Path,
      tablePath: String, keyCol: String, partCol: String): Unit = {
    // One normalization for "lives in __HIVE_DEFAULT_PARTITION__":
    // null and "" share that directory.
    val pNorm = when(col(partCol).cast("string").isNull ||
      col(partCol).cast("string") === "", lit(null))
      .otherwise(col(partCol).cast("string"))
    def keyParts() = noInfer.read.parquet(tablePath)
      .select(col(keyCol).as("__k"), pNorm.as("__p"))
    // Persisted for the detection self-join: without it the (key,
    // partition) projection would scan the table parquet twice on every
    // healthy-path entry.
    val kp = keyParts().persist()
    val candidates = try {
      // Distinct partition count per key; nulls counted via a one-field
      // struct (count(DISTINCT col) would drop the null partition).
      val perKey = kp.groupBy(col("__k").as("__k2"))
        .agg(countDistinct(struct(col("__p"))).as("__n"))
      kp.join(perKey, col("__k") <=> col("__k2"))
        .groupBy(col("__p")).agg(min(col("__n")).as("__minn"))
        .filter(col("__minn") >= 2)
        .select(col("__p")).collect().map(r =>
          if (r.isNullAt(0)) null else r.getString(0))
    } finally kp.unpersist()
    if (candidates.isEmpty) return
    def dirOf(v: String) = new org.apache.hadoop.fs.Path(cur,
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .getPartitionPathString(partCol, v))
    val present = candidates.filter(v => fs.exists(dirOf(v)))
    val mtimeOf = present.map(v =>
      v -> fs.getFileStatus(dirOf(v)).getModificationTime).toMap
    val byAge = present.sortBy(mtimeOf)
    def inSet(c: Column, vs: Seq[String]): Column = {
      val nonNull = vs.filter(_ != null)
      val base = if (nonNull.isEmpty) lit(false)
        else c.isInCollection(nonNull)
      if (vs.contains(null)) base || c.isNull else base
    }
    byAge.foreach { v =>
      // A key copy only legitimizes deleting v if it lives somewhere
      // that will itself SURVIVE: a non-candidate partition, or a
      // candidate STRICTLY newer than v. Mirrored partitions with tied
      // directory mtimes (coarse-granularity filesystems) therefore
      // protect each other — duplicates persist until a batch touches
      // the key, instead of a nondeterministic order deleting the NEW
      // copy and silently reverting data.
      val notSafe = byAge.filter(w => w != v && mtimeOf(w) <= mtimeOf(v))
      // Re-read per candidate: each delete invalidates the previous
      // read's file listing, and the re-check must see prior deletions.
      val cur2 = keyParts()
      val mine = cur2.filter(col("__p") <=> v)
      val others = cur2
        .filter(!(col("__p") <=> v) && !inSet(col("__p"), notSafe))
        .select(col("__k").as("__ok"))
      val orphans = mine.join(others, col("__k") <=> col("__ok"), "left_anti")
        .limit(1).count()
      if (orphans == 0) {
        require(fs.delete(dirOf(v), true),
          s"heal: delete of stale partition ${dirOf(v)} failed")
      }
    }
  }

  /** Attach as a foreachBatch sink: each micro-batch merges on `keyCol`.
    * Usage:
    * {{{
    * df.writeStream.foreachBatch(UpsertSink.foreachBatch(path, "id")) ...
    * }}}
    */
  def foreachBatch(tablePath: String, keyCol: String)
      : (DataFrame, Long) => Unit =
    (batch, _) => upsert(batch, tablePath, keyCol)

  /** Partition-scoped streaming variant of [[foreachBatch]]: each
    * micro-batch merges through [[upsertPartitioned]], rewriting only
    * the partitions its keys touch.
    */
  def foreachBatchPartitioned(tablePath: String, keyCol: String,
      partCol: String, keysArePartitionStable: Boolean = false)
      : (DataFrame, Long) => Unit =
    (batch, _) => upsertPartitioned(batch, tablePath, keyCol, partCol,
      keysArePartitionStable)

  /** Drive a parquet-drop stream through the upsert sink until all
    * available input is processed (test/dev entry).
    */
  def runStream(spark: SparkSession, srcDir: String, schema: String,
      tablePath: String, keyCol: String): Unit = {
    val q = spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .foreachBatch(foreachBatch(tablePath, keyCol))
      .option("checkpointLocation", tablePath + ".chk")
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
