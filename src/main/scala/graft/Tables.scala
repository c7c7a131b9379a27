package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated testdata tables (TESTDATA.md).
  *
  * Every query in the engine takes a `sfDir` (scale-factor directory) and
  * reads the parquet tables from it — the same tables the DuckDB oracle
  * reads. At 100 TB these would be partitioned/bucketed warehouse tables;
  * the access path (columnar parquet scan with pushed filters + pruned
  * columns) is identical.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The documents table's DDL schema — shared by the corpus
    * interchange readers (JSONL/CSV round-trips) and the corpus
    * pipeline's ingest stage, which must parse exactly these columns.
    */
  val DocumentsSchema =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects by default. Read nanos as long (legacy conf) and canonicalize
    * to a microsecond TimestampType via integer floor-division — the exact
    * value DuckDB's epoch_us(ts) produces, so oracle comparisons and
    * orderings agree at micro resolution (sub-µs information is dropped
    * deterministically on both sides).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
