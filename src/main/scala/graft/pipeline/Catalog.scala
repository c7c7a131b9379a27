package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4/P7 metadata surface (reference: scripts/ml_pipeline.py:107-114;
  * turbine_etl_dbt/models/stg_cycles_raw.sql:1-9;
  * streamlit_dashboard.py:143-145): catalog existence checks and
  * name-pattern column enumeration — driver-side schema logic, the Spark
  * analog of dbt's adapter.get_columns_in_relation.
  */
object CatalogOps {

  /** sqlite_master existence probe → Spark catalog. */
  def tableExists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(name)

  /** Read the first existing table from a fallback chain (the
    * fct_cycles_features → cycles_features fallback in ml_pipeline.py:
    * 118-125).
    */
  def readFirstExisting(spark: SparkSession, names: Seq[String]): Option[DataFrame] =
    names.find(tableExists(spark, _)).map(spark.table)

  /** Columns matching a prefix (dbt's `col[:6] == 'sensor'` Jinja test). */
  def prefixCols(df: DataFrame, prefix: String): Seq[String] =
    df.columns.filter(_.startsWith(prefix)).toSeq

  /** Columns matching a regex (the dashboard's `(mean.*sensor.*)` pick). */
  def regexCols(df: DataFrame, pattern: String): Seq[String] = {
    val re = pattern.r
    df.columns.filter(c => re.findFirstIn(c).isDefined).toSeq
  }

  /** Feature columns = everything except keys/metadata
    * (ml_pipeline.py:134-136).
    */
  def featureCols(df: DataFrame, exclude: Seq[String]): Seq[String] =
    df.columns.filterNot(exclude.contains).toSeq
}
