package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming similarity serving — the online half of a vector store:
  * vectors arrive on a stream and each micro-batch is answered top-k
  * against a PERSISTED LSH index
  * ([[graft.operators.Similarity.saveLshIndex]] output).
  *
  * Shape: the stream is STATELESS — every trigger is an independent
  * batch-semantics join (foreachBatch) of the arriving vectors against
  * the static index table, so there is no state store, watermarks play
  * no role, and throughput scales with executors × index partitioning
  * alone. This is deliberately NOT a streaming aggregation: per-query
  * top-k needs full intra-batch semantics (window rank over the
  * candidate set), which foreachBatch provides and append-mode
  * streaming aggregation cannot.
  */
object StreamingSimilarity {

  /** Drive a (vec_id, embedding) parquet-drop stream against the index;
    * each micro-batch's top-k rows append to `outDir` as parquet —
    * results are written as they are computed, never buffered on the
    * driver. Blocks until all available input is processed.
    */
  def serveTopk(spark: SparkSession, srcDir: String, indexPath: String,
      outDir: String, maxFilesPerTrigger: Int = 0): Unit = {
    val reader = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
    val src = (if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader)
      .parquet(srcDir)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.Similarity.topkAgainstLshIndex(batch, indexPath)
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
