package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** K1/K2 sinks (reference: scripts/etl_turbofan.py:119-146): parquet
  * warehouse writes with replace/append, partitioned by dataset and
  * sorted within partitions on the window key — the Spark analog of the
  * reference's (dataset, unit_nr) secondary indexes (sql/sqlite_ddl.sql:
  * 30-31); downstream window jobs then shuffle-and-sort data that is
  * already clustered.
  */
object TableIO {

  def writeTable(df: DataFrame, path: String, overwrite: Boolean,
      partitionCols: Seq[String] = Seq("dataset"),
      sortCols: Seq[String] = Seq("unit_nr", "time_cycles")): Unit = {
    val mode = if (overwrite) SaveMode.Overwrite else SaveMode.Append
    val sorted =
      if (sortCols.forall(df.columns.contains))
        df.sortWithinPartitions(sortCols.map(col): _*)
      else df
    val w = sorted.write.mode(mode)
    (if (partitionCols.forall(df.columns.contains))
      w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  def readTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV export (etl_turbofan.py:141-146). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
}

/** The two-pass ETL lifecycle (reference: scripts/etl_turbofan.py:151-216,
  * traced in SURVEY §3.1):
  *
  * pass 1 (stats): read every dataset, detect variable sensors, intersect
  * across datasets → the forced common sensor set;
  * pass 2 (per dataset): read → project to the common set → feature
  * windows → write cycles_raw / cycles_features / units_summary, first
  * dataset replacing, the rest appending (U1 protocol).
  *
  * The reference crashes on its own print(json_body=...) calls at
  * etl_turbofan.py:70,77 — this implements the documented intent
  * (SURVEY §7.4.11).
  */
object EtlJob {

  case class DatasetInput(name: String, trainPath: String)
  case class Config(datasets: Seq[DatasetInput], windows: Seq[Int] = Seq(5, 20),
      warehouseDir: String, nSensors: Int = 21, exportCsv: Boolean = false)

  case class Result(sensors: Seq[String], rowsPerDataset: Map[String, Long])

  def run(spark: SparkSession, cfg: Config): Result = {
    // Pass 1 — statistics: per-dataset variable sensors, intersected.
    val sensorNames = CmapssSchema.sensorCols(cfg.nSensors)
    val frames = cfg.datasets.map(ds =>
      ds.name -> CmapssReader.read(spark, ds.trainPath, ds.name, cfg.nSensors))
    val common = SensorStats.commonVariableSensors(frames.map(_._2), sensorNames)

    // Pass 2 — per dataset: project, feature, write (replace then append).
    val counts = frames.zipWithIndex.map { case ((name, raw), i) =>
      val base = raw.select(
        (Seq("dataset") ++ CmapssSchema.keyCols ++ CmapssSchema.settingCols ++
          common).map(col): _*)
      val feat = FeatureEngineering.features(base, common, cfg.windows)
      val overwrite = i == 0
      TableIO.writeTable(base, s"${cfg.warehouseDir}/cycles_raw", overwrite)
      TableIO.writeTable(feat, s"${cfg.warehouseDir}/cycles_features", overwrite)
      TableIO.writeTable(UnitsSummary(base), s"${cfg.warehouseDir}/units_summary",
        overwrite, partitionCols = Seq("dataset"), sortCols = Seq("unit_nr"))
      if (cfg.exportCsv)
        TableIO.writeCsv(feat, s"${cfg.warehouseDir}/cycles_features_csv/$name")
      name -> base.count()
    }.toMap
    Result(common, counts)
  }
}
