package graft

import org.apache.spark.sql.SparkSession

/** Inventory-wide scale gate: times EVERY declared query at 1× and at a
  * replicated `factor`× warehouse ([[ScaleData.writeScaledWarehouse]])
  * and reports the per-query growth factor — the super-linear-plan
  * detector the plan-hygiene specs cannot be (a plan can be
  * shuffle-clean and broadcast-correct and still hide accidental
  * re-evaluation, skew, or a quadratic candidate set that only shows up
  * as wall-clock growth). ScaleSmoke measures ~40 hand-picked kernels;
  * this runs the FULL inventory, so a creeper in any of the other ~160
  * queries surfaces before it matters at 100 TB.
  *
  * Protocol: per query, one warm pass + one measured pass at each
  * scale, in sorted name order (warm pass populates JIT, codegen
  * caches, and the per-dir pinned signature/centroid tables — a cold
  * 10× first run would charge one-time pin population to the growth
  * number). A query is flagged when growth exceeds [[DefaultBound]]
  * (n·log n on 10× data is ~11.7×, plus scheduling overhead) AND its
  * 10× time is material (> [[MaterialSec]] — a 0.1s→1.5s query is
  * fixed-overhead noise, not a scale signal), unless an [[exemptions]]
  * entry raises its bound with a reason (algorithms whose work is
  * super-linear BY SPEC, e.g. exact all-pairs similarity) or a
  * [[workGated]] entry replaces the wall comparison with an exact,
  * variance-free work metric (wall kept only as a loose backstop).
  *
  * Usage: runMain graft.GrowthGate [factor] [srcSfDir] [scratchDir]
  *   [query ...]
  * Env: GRAFT_GROWTH_ONLY=substr[,substr] restricts by substring.
  * Artifact: growth_gate.json (full per-query map + flags); progress
  * lines stream per query so a long run is observable.
  */
object GrowthGate {
  val DefaultBound = 12.0
  val MaterialSec = 3.0

  /** Queries whose cost model is super-linear by SPEC: (bound at 10×,
    * cost-model exponent, reason the judge should read). At another
    * factor f the bound scales as bound₁₀ · (f/10)^(exponent−1) ON TOP
    * of the gate's linear (f/10) scaling — i.e. a quadratic-spec
    * exemption (exponent 2) scales its bound by (f/10)², because a
    * healthy by-spec quadratic lands at ~f²/100 × its 10× wall, and
    * linear scaling alone would flag it at any f > 10.
    */
  val exemptions: Map[String, (Double, Double, String)] = Map(
    "sim_knn_self" -> (150.0, 2.0,
      "exact all-pairs self-join: scored pairs grow quadratically " +
        "(100x) by definition; the tiled kernel bounds task size, " +
        "not total work"),
    "dd_cosine_neardup" -> (150.0, 2.0,
      "exact all-pairs cosine screen: quadratic scored-pair count by " +
        "definition (the LSH/semantic variants are the scale path)"),
    "dd_semantic" -> (30.0, 1.0,
      "near-dup pair OUTPUT grows superlinearly when corpus growth " +
        "densifies the embedding manifold (r12 measured 20x wall at " +
        "10x; the r13 assign/cells retune brought the measured point " +
        "to 2.2x at 10x and 3.6x at 30x, so the linear-scaled bound " +
        "now holds with wide margin)"),
    "ml_model_compare" -> (40.0, 1.0,
      "CV model training: optimizer iteration count is data-dependent, " +
        "not a relational plan property"))

  /** Queries gated on a MEASURED WORK METRIC instead of raw wall time.
    * g4_jaccard's r12 story motivated this: its candidate-pair volume
    * is exactly linear (12,544,866 → 125,448,660 = 10.0× at 10×,
    * DuckDB-verified, variance-free) while the pair STAGE's wall swung
    * 11–69s run-to-run under shared-box shuffle/GC pressure — a wall
    * bound loose enough to absorb that variance (25×) would also pass
    * a genuine quadratic. Two checks per entry, both deterministic in
    * what they compare against:
    *
    *  1. WORK CONTRACT — the metric's own growth must stay within
    *     `workSlack` × factor (the operator's documented cost model is
    *     ~linear in the data; a quadratic candidate set shows up here
    *     as ~factor², unmissably, regardless of scheduler noise).
    *     `workSlack` absorbs how the SCALED CORPUS legitimately
    *     inflates per-item work: dd_edit_distance's DP is quadratic in
    *     document LENGTH and the 10× generator suffixes every token
    *     (+~33% chars → ~1.78× per-pair DP cost — measured wall 14.5×
    *     at 10× is the corpus, not the plan).
    *  2. WALL TRACKS WORK — wall growth beyond `wallSlack` × the
    *     measured work growth flags a plan regression the metric
    *     cannot see (re-evaluated generators, lost broadcast, a
    *     straggler key).
    *
    * Value per name: (workSlack, wallSlack, metric fn, why).
    */
  val workGated: Map[String,
      (Double, Double, (SparkSession, String) => Double, String)] = Map(
    "g4_jaccard" -> (1.3, 2.5,
      (s: SparkSession, dir: String) =>
        operators.Graph.jaccardPairVolume(s, dir),
      "work = candidate-pair volume sum_c C(deg_c,2): the chunked " +
        "generator's exact output contract, linear for bounded " +
        "customer degree; wall tracking catches a regressed pair " +
        "stage the count cannot see"),
    "g4_jaccard_capped" -> (1.3, 2.5,
      (s: SparkSession, dir: String) =>
        operators.Graph.jaccardCappedWork(s, dir),
      "work = capped candidate volume sum_{deg<=cap} C(deg,2): stays " +
        "~linear under a Zipf tail BY CONSTRUCTION — the gate " +
        "verifies the curation-mode bound instead of excusing exact-" +
        "jaccard's quadratic hub response"),
    "dd_edit_distance" -> (1.5, 2.5,
      (s: SparkSession, dir: String) =>
        operators.Dedup.editDistanceWork(s, dir),
      "work = mean-length-NORMALIZED banded-DP cost over LSH " +
        "candidate pairs (min_len*(2k+3), or ~1 past the length-gap " +
        "early exit, / corpus mean len): the operator now runs Spark " +
        "4's thresholded levenshtein, and normalizing by mean length " +
        "cancels the generator's uniform token-suffix inflation, so " +
        "the metric tracks candidate COUNT - slack tightened 2.5 -> " +
        "1.5; a quadratic candidate blow-up (~factor^2) still flags"))

  /** The gate's entire per-query flag policy, as a pure function (the
    * BenchGate precedent: decision logic spec-testable without Spark or
    * a scaled warehouse).
    *
    * Wall bounds are CALIBRATED AT 10× (n·log n on 10× data ≈ 11.7×
    * plus overhead); at another factor f they scale by (f/10), and an
    * exemption with cost-model exponent e scales by (f/10)^e — a
    * healthy by-spec quadratic lands at ~(f/10)² × its 10× wall, so a
    * linearly-scaled bound would flag it at any f > 10. Work-gated
    * queries ignore the wall bound entirely: the metric's own growth
    * must stay within workSlack·factor (the cost-model contract), and
    * the wall must stay within wallSlack × the measured work growth.
    */
  private[graft] def flagged(factor: Int, name: String, t1: Double,
      tN: Double, work: Option[(Double, Double)]): Boolean = {
    if (t1 <= 0) return false
    def scaled(b: Double): Double = b * factor / 10.0
    workGated.get(name) match {
      case Some((workSlack, wallSlack, _, _)) =>
        val wg = work.map { case (w1, wN) => wN / math.max(w1, 1.0) }
        wg.exists(_ > factor * workSlack) ||
          (wg.exists(g => tN / math.max(t1, 0.05) >
            wallSlack * math.max(g, 1.0)) && tN > MaterialSec)
      case None =>
        val bound = exemptions.get(name) match {
          case Some((b, exp, _)) =>
            scaled(b) * math.pow(factor / 10.0, exp - 1.0)
          case None => scaled(DefaultBound)
        }
        tN / math.max(t1, 0.05) > bound && tN > MaterialSec
    }
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(2).getOrElse(s"/tmp/graft_growth$factor")
    val only = args.drop(3).toSet ++
      sys.env.get("GRAFT_GROWTH_ONLY").toSeq
        .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ScaleData.writeScaledWarehouse(spark, src, scratch, factor, cpus.toInt)

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
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.exists(n.contains))
    val rows = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Double, String)] // name, t1, tN, err
    // name -> (work1, workN) for the work-gated queries — measured once
    // per query, not per timing pass (the metric is deterministic).
    val work = scala.collection.mutable.Map.empty[String, (Double, Double)]
    names.foreach { name =>
      val r = try {
        val t1 = timed(name, src)
        val tN = timed(name, scratch)
        workGated.get(name).foreach { case (_, _, metric, _) =>
          work(name) = (metric(spark, src), metric(spark, scratch))
        }
        (name, t1, tN, "")
      } catch {
        case e: Throwable => (name, -1.0, -1.0, errLine(name, e))
      }
      rows += r
      val g = if (r._2 > 0) r._3 / r._2 else -1.0
      println(f"[growth] ${r._1}%-28s t1=${r._2}%7.2f t$factor=" +
        f"${r._3}%8.2f growth=$g%6.1f ${r._4}" +
        work.get(r._1).map { case (w1, wN) =>
          f" work=${w1}%.0f->${wN}%.0f (${wN / math.max(w1, 1)}%4.1fx)"
        }.getOrElse(""))
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def scaled(b: Double): Double = b * factor / 10.0
    def flagsOf(rs: Seq[(String, Double, Double, String)]): Seq[String] =
      rs.collect {
        case (n, t1, tN, "")
          if flagged(factor, n, t1, tN, work.get(n)) => n
      }
    // Self-defense (the bench floor-defense idea applied to growth): a
    // wall-flagged query gets ONE fresh (t1, tN) pair, and the verdict
    // ratio is min(tN)/min(t1) ACROSS both pairs — noise only inflates
    // a timing, so the per-scale minima are the honest estimates of
    // both numerator and denominator. (Keeping the whole smaller-ratio
    // PAIR, as this loop first did, let one inflated t1 denominator
    // deflate the kept growth and mask a borderline super-linear plan.)
    // A REAL super-linear plan reproduces its ratio in both pairs.
    // Work-CONTRACT flags are never re-measured: the metric is
    // deterministic, so its verdict is already evidence.
    val remeasured = flagsOf(rows.toSeq).filter(n =>
      workGated.get(n).forall { case (workSlack, _, _, _) =>
        work.get(n).forall { case (w1, wN) =>
          wN / math.max(w1, 1.0) <= factor * workSlack } })
    remeasured.foreach { name =>
      try {
        val t1b = timed(name, src)
        val tNb = timed(name, scratch)
        val i = rows.indexWhere(_._1 == name)
        val (_, t1a, tNa, _) = rows(i)
        rows(i) = (name, math.min(t1a, t1b), math.min(tNa, tNb), "")
        println(f"[growth] $name%-28s REMEASURED t1=$t1b%7.2f " +
          f"t$factor=$tNb%8.2f kept=${
            math.min(tNa, tNb) / math.max(math.min(t1a, t1b), 0.05)}%6.1f")
      } catch { case e: Throwable =>
        println(s"[growth] $name remeasure failed: ${errLine(name, e)}")
      }
    }
    val flags = flagsOf(rows.toSeq)
    val failed = rows.collect { case (n, _, _, e) if e.nonEmpty => n }
    val qJson = rows.map { case (n, t1, tN, _) =>
      s""""$n":{"t1":${fmt(t1)},"t$factor":${fmt(tN)},"growth":${
        fmt(if (t1 > 0) tN / math.max(t1, 0.05) else -1.0)}${
        work.get(n).map { case (w1, wN) =>
          s""","work1":${fmt(w1)},"work$factor":${fmt(wN)},""" +
            s""""work_growth":${fmt(wN / math.max(w1, 1.0))}"""
        }.getOrElse("")}}"""
    }.mkString("{", ",", "}")
    val exJson = exemptions.toSeq.sortBy(_._1).map {
      case (n, (b, exp, why)) =>
        s""""$n":{"bound":${
          fmt(scaled(b) * math.pow(factor / 10.0, exp - 1.0))},""" +
          s""""cost_exponent":${fmt(exp)},"why":"$why"}"""
    }.mkString("{", ",", "}")
    val wgJson = workGated.toSeq.sortBy(_._1).map {
      case (n, (workSlack, wallSlack, _, why)) =>
        s""""$n":{"work_bound":${fmt(factor * workSlack)},""" +
          s""""wall_tracks_work_slack":${fmt(wallSlack)},"why":"$why"}"""
    }.mkString("{", ",", "}")
    def arr(xs: Seq[String]) =
      xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line =
      s"""{"metric":"growth_gate","factor":$factor,"n":${rows.size},""" +
        s""""bound":${fmt(scaled(DefaultBound))},"material_sec":$MaterialSec,""" +
        s""""flags":${arr(flags.toSeq)},"failed":${arr(failed.toSeq)},""" +
        s""""remeasured":${arr(remeasured)},""" +
        s""""exemptions":$exJson,"work_gated":$wgJson,""" +
        s""""only":${arr(only.toSeq)},"queries":$qJson,"sf":"$src"}"""
    // Subset (dev) runs write a side file — overwriting the full-run
    // artifact with a partial map would destroy the committed gate.
    // This applies at EVERY factor: the 30×/100× heavy-family gates
    // are standing committed artifacts too, and a one-query dev probe
    // at factor 30 must not silently replace them. The intended
    // heavy-family coverage for those gates is launched as one run
    // with the family list in `only`, via GRAFT_GROWTH_FULL=1.
    val subsetSuffix =
      if (only.isEmpty || sys.env.contains("GRAFT_GROWTH_FULL")) ""
      else "_subset"
    val artifact =
      if (factor != 10) s"growth_gate_${factor}x$subsetSuffix.json"
      // Factor 10's standing artifact is the FULL inventory — no
      // env-var override: a subset can never claim growth_gate.json.
      else if (only.isEmpty) "growth_gate.json"
      else "growth_gate_subset.json"
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (line + "\n").getBytes("UTF-8"))
    println(s"""{"metric":"growth_gate","factor":$factor,"n":${rows.size},""" +
      s""""flags":${arr(flags.toSeq)},"failed":${arr(failed.toSeq)},""" +
      s""""detail":"$artifact"}""")
    spark.stop()
  }
}
