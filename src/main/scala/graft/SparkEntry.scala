package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain operator registries. Every entry in [[queries]]
  * that appears in [[oracleSql]] is differentially checked against DuckDB
  * running the oracle SQL on the same parquet tables (sorted columns,
  * hashed values) — column names and row order are kept identical by
  * construction (see package object `graft` for the determinism helpers).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Windows.features(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Windows.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextAnalysis.queries ++
      operators.Multimodal.queries ++
      operators.SqlSurface.queries ++
      operators.Extended.queries ++
      operators.TemporalJoins.queries ++
      operators.ScalarOps.queries ++
      operators.TpchQueries.queries ++
      operators.CorpusOps.queries ++
      operators.Layout.queries ++
      operators.Graph.queries ++
      operators.Stats.queries ++
      pipeline.MlPipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (the
    * approximate LSH ANN variant and the stub-decoder pipeline get the
    * driver's weaker rows-only check; both are additionally spec-tested
    * against their exact baselines).
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++
      operators.Windows.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      operators.TextAnalysis.oracle ++
      operators.Multimodal.oracle ++
      operators.SqlSurface.oracle ++
      operators.Extended.oracle ++
      operators.TemporalJoins.oracle ++
      operators.ScalarOps.oracle ++
      operators.TpchQueries.oracle ++
      operators.CorpusOps.oracle ++
      operators.Layout.oracle ++
      operators.Graph.oracle ++
      operators.Stats.oracle ++
      pipeline.MlPipeline.oracle
}
