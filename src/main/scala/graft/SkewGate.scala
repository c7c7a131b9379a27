package graft

import org.apache.spark.sql.SparkSession

/** Realistic-skew scale gate: the growth gates measure clone-grown data
  * whose key frequencies stay uniform-ish, and [[HubGate]] plants ONE
  * adversarial node; this gate times the order-reading heavy queries on
  * a Zipf(α = 1.2)-keyed variant ([[ScaleData.writeZipfWarehouse]]) of
  * BOTH scales and reports growth — a plan that is linear on uniform
  * keys but straggles on a heavy-tailed key distribution (a lost salt,
  * a per-key buffer that rides the popular key) shows up here and
  * nowhere else. The flag policy is [[GrowthGate.flagged]] verbatim —
  * same bounds, same work-metric contract for g4 (whose pair volume on
  * skewed keys is legitimately superlinear in data growth: Σ C(deg, 2)
  * grows ~growth² on the popular customers — exactly what the
  * work-gated wall-tracks-work rule prices correctly and a naive wall
  * bound would misread).
  *
  * Usage: runMain graft.SkewGate [factor] [srcSfDir] [scratchDir]
  * Artifact: growth_gate_skew.json
  */
object SkewGate {
  /** Order-reading heavies: the queries whose shuffle keys the Zipf
    * remap actually skews (document/embedding families read tables the
    * variant leaves untouched).
    */
  val Names = Seq("g1_pagerank", "g2_triangles", "g3_reach", "g4_jaccard",
    "g4_jaccard_capped",
    "sql_grid_mixed", "a7_two_level", "o2_topk_recent", "j1_broadcast_join")

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(2).getOrElse(s"/tmp/graft_growth$factor")
    val alpha = 1.2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleData.writeScaledWarehouse(spark, src, scratch, factor, cpus.toInt)
    val z1 = s"${scratch}_zipf1"
    val zN = s"${scratch}_zipf$factor"
    ScaleData.writeZipfWarehouse(spark, src, z1, alpha)
    ScaleData.writeZipfWarehouse(spark, scratch, zN, alpha)
    val (maxDeg1, _) = operators.Graph.customerDegreeStats(spark, z1)
    val (maxDegN, pairVolN) = operators.Graph.customerDegreeStats(spark, zN)
    println(s"[skew] zipf alpha=$alpha max_customer_degree " +
      s"1x=$maxDeg1 ${factor}x=$maxDegN pair_volume_${factor}x=$pairVolN")

    def runFull(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .queryExecution.toRdd.foreachPartition { it =>
          while (it.hasNext) it.next()
        }
    def timed(name: String, dir: String): Double = {
      runFull(name, dir) // warm: JIT + per-dir pins
      val t0 = System.nanoTime()
      runFull(name, dir)
      (System.nanoTime() - t0) / 1e9
    }
    val work = scala.collection.mutable.Map.empty[String, (Double, Double)]
    val rows = Names.map { name =>
      val r = try {
        val t1 = timed(name, z1)
        val tN = timed(name, zN)
        GrowthGate.workGated.get(name).foreach { case (_, _, metric, _) =>
          work(name) = (metric(spark, z1), metric(spark, zN))
        }
        (name, t1, tN, "")
      } catch {
        case e: Throwable => (name, -1.0, -1.0, errLine(name, e))
      }
      println(f"[skew] ${r._1}%-18s t1=${r._2}%7.2f t$factor=${r._3}%8.2f " +
        f"growth=${if (r._2 > 0) r._3 / r._2 else -1.0}%6.1f ${r._4}" +
        work.get(r._1).map { case (w1, wN) =>
          f" work=${w1}%.0f->${wN}%.0f (${wN / math.max(w1, 1)}%4.1fx)"
        }.getOrElse(""))
      r
    }
    // Curation-mode accuracy on the SKEWED corpus — the number that
    // justifies g4_jaccard_capped's existence: top-k overlap between
    // the capped variant and exact g4 on the Zipf warehouses (both
    // orders are deterministic; sets compared as unordered id pairs).
    // Measured at BOTH scales: z1 is cheap, and the factor-N point
    // shows the overlap the cap actually trades under the full tail.
    def topPairs(name: String, dir: String): Set[(String, String)] =
      SparkEntry.queries(name)(spark, dir)
        .select("s1", "s2").collect()
        .map(r => (r.get(0).toString, r.get(1).toString)).toSet
    def cappedRecall(dir: String): Double = {
      val exact = topPairs("g4_jaccard", dir)
      val capped = topPairs("g4_jaccard_capped", dir)
      if (exact.isEmpty) 1.0
      else exact.intersect(capped).size.toDouble / exact.size
    }
    val (recall1, recallN) = (cappedRecall(z1), cappedRecall(zN))
    println(f"[skew] g4_jaccard_capped top-k recall vs exact: " +
      f"z1=$recall1%.3f z$factor=$recallN%.3f")

    // Skew-specific flag policy: for work-gated queries the WORK
    // CONTRACT check is dropped — on Zipf keys the candidate volume is
    // legitimately superlinear in data growth (the popular customers'
    // degrees grow with the data, so Σ C(deg, 2) grows ~factor² by the
    // operator's own semantics), and flagging the semantics would be a
    // false positive. What skew can break is the PLAN: wall growth
    // beyond wallSlack × the measured work growth (a straggling key the
    // chunking failed to spread) — that check stays. Non-work-gated
    // queries keep the full GrowthGate policy.
    def skewFlagged(n: String, t1: Double, tN: Double): Boolean =
      GrowthGate.workGated.get(n) match {
        case Some((_, wallSlack, _, _)) =>
          work.get(n).exists { case (w1, wN) =>
            tN / math.max(t1, 0.05) >
              wallSlack * math.max(wN / math.max(w1, 1.0), 1.0) &&
              tN > GrowthGate.MaterialSec
          }
        case None => GrowthGate.flagged(factor, n, t1, tN, None)
      }
    val flags = rows.collect {
      case (n, t1, tN, "") if skewFlagged(n, t1, tN) => n
    }
    val failed = rows.collect { case (n, _, _, e) if e.nonEmpty => n }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def arr(xs: Seq[String]) =
      xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qJson = rows.map { case (n, t1, tN, _) =>
      s""""$n":{"t1":${fmt(t1)},"t$factor":${fmt(tN)},"growth":${
        fmt(if (t1 > 0) tN / math.max(t1, 0.05) else -1.0)}${
        work.get(n).map { case (w1, wN) =>
          s""","work1":${fmt(w1)},"work$factor":${fmt(wN)},""" +
            s""""work_growth":${fmt(wN / math.max(w1, 1.0))}"""
        }.getOrElse("")}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"growth_gate_skew","factor":$factor,"alpha":$alpha,""" +
        s""""n":${rows.size},"max_customer_degree_1x":$maxDeg1,""" +
        s""""max_customer_degree_${factor}x":$maxDegN,""" +
        s""""capped_recall":{"z1":${fmt(recall1)},""" +
        s""""z$factor":${fmt(recallN)}},""" +
        s""""flags":${arr(flags)},"failed":${arr(failed)},""" +
        s""""queries":$qJson,"sf":"$src"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get("growth_gate_skew.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
