package graft

import org.apache.spark.sql.SparkSession

/** SemDeDup persisted-index scale probe: separates the ONE-TIME index
  * build cost (k-means train over the full corpus + the N·cells
  * assignment pass + the partitioned write) from the SERVE cost
  * (within-cell pair join from the persisted assignment table — no
  * train, no corpus read), at a replicated `factor`× corpus.
  *
  * This is the number the growth gates could not show: their protocol
  * warms each query once per dir, so `dd_semantic`'s measured pass
  * already serves against session-resident state — the gate growth is
  * honest for a long-lived session, but a fresh serving deployment pays
  * either the full train (no index) or a parquet read (persisted
  * index), and only this probe prices that difference. The in-session
  * cold/warm walls are recorded alongside for the comparison.
  *
  * Usage: runMain graft.SemIndexGate [factor] [srcSfDir] [scratchDir]
  * Artifact: sem_index_gate.json
  */
object SemIndexGate {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(2).getOrElse(s"/tmp/graft_growth$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleData.writeScaledWarehouse(spark, src, scratch, factor, cpus.toInt)
    val indexPath = s"${scratch}_semindex"
    org.apache.commons.io.FileUtils
      .deleteQuietly(new java.io.File(indexPath))

    def consume(df: org.apache.spark.sql.DataFrame): Long = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) it.next()
      }
      System.nanoTime() - t0
    }
    // In-session operator first: the COLD wall prices train + assign +
    // pair join (what a fresh session pays without an index); the WARM
    // wall serves against the session-resident centroids/assignments.
    val coldNs = consume(SparkEntry.queries("dd_semantic")(spark, scratch))
    val warmNs = consume(SparkEntry.queries("dd_semantic")(spark, scratch))
    // Persisted-index lifecycle: one-time build, then serve-only walls
    // (every serve re-reads the assignment table — no session state).
    val tb0 = System.nanoTime()
    operators.Similarity.saveSemDedupIndex(spark, scratch, indexPath)
    val buildNs = System.nanoTime() - tb0
    // Two serve passes: first is the JIT/codegen warm, second is the
    // steady-state serve a deployment sees.
    consume(operators.Similarity.semanticPairsAgainstIndex(spark, indexPath))
    val serveNs = consume(
      operators.Similarity.semanticPairsAgainstIndex(spark, indexPath))
    val pairs = operators.Similarity
      .semanticPairsAgainstIndex(spark, indexPath).count()
    val nVec = spark.read.parquet(s"$indexPath/assignments")
      .select("vec_id").distinct().count()
    def s(ns: Long) = String.format(java.util.Locale.ROOT, "%.3f",
      Double.box(ns / 1e9))
    val line =
      s"""{"metric":"sem_index_gate","factor":$factor,""" +
        s""""n_vectors":$nVec,"pairs":$pairs,""" +
        s""""build_sec":${s(buildNs)},"serve_sec":${s(serveNs)},""" +
        s""""insession_cold_sec":${s(coldNs)},""" +
        s""""insession_warm_sec":${s(warmNs)},""" +
        s""""index_path":"$indexPath","sf":"$src"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"sem_index_gate_${factor}x.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
