package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming benchmark decontamination — the online half of the
  * `pp_decontaminate` pass: documents arrive on a stream and each
  * micro-batch is screened against the STATIC benchmark gram set, so
  * eval-set leakage is dropped at ingest instead of in a later batch
  * sweep.
  *
  * Shape (the [[StreamingSimilarity]] pattern): STATELESS — the
  * benchmark set is fixed for the life of the query (held-out eval
  * sets version slowly, and a new benchmark release is a new stream),
  * so every trigger is an independent batch-semantics anti-join with
  * no state store and no watermark. The gram set builds ONCE outside
  * the loop and broadcasts per batch — bounded by the benchmark's
  * vocabulary, never the stream's. The screen itself is
  * [[graft.operators.CorpusOps.screenClean]], the same definition the
  * batch pass composes from, so the two paths cannot drift.
  */
object StreamingDecontaminate {

  /** Drive a documents parquet-drop stream against the benchmark split
    * of `benchDir`; each micro-batch's CLEAN rows land under
    * `outDir/batch=<id>` (overwritten per batch id, so a replayed
    * source converges instead of appending duplicates). Blocks until
    * all available input is processed.
    */
  def screen(spark: SparkSession, srcDir: String, benchDir: String,
      outDir: String, maxFilesPerTrigger: Int = 0): Unit = {
    // Pin + materialize the gram set BEFORE the stream starts: a lazy
    // frame would re-scan the benchmark corpus and re-run its distinct
    // shuffle on every trigger for a set that is constant for the
    // query's life.
    val bench = graft.ContextCaches.pin(graft.operators.CorpusOps
      .benchGramSet(graft.Tables.documents(spark, benchDir)))
    bench.count()
    val reader = spark.readStream.schema(graft.Tables.DocumentsSchema)
    val src = (if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader)
      .parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // The screen reads the micro-batch twice (gram side + anti-join
        // left side); a bounded per-trigger persist halves that I/O and
        // releases before the next trigger.
        batch.persist()
        try graft.operators.CorpusOps.screenClean(batch, bench)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        finally batch.unpersist()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
