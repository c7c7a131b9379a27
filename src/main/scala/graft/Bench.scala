package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * reports timings as driver-parseable JSON.
  *
  * Output protocol (rounds 1 and 2 both landed `parsed: null` because the
  * driver tail-captures only the last ~2 KB of stdout and a single long
  * JSON line gets its HEAD chopped — and sbt's own "[success]" line eats
  * the end of the window):
  *   - full results are written to ./bench_results.json (always complete);
  *   - per-query timings are printed as several SHORT standalone JSON
  *     lines `{"part":i,"of":n,"queries":{...}}` — each well under the
  *     tail window, so at most the first can be chopped and every later
  *     line still parses on its own;
  *   - the LAST line printed is a compact summary in the contract shape
  *     `{"metric":"total","value":…,"unit":"sec",…}` small enough that it
  *     plus sbt's trailer always fits in the tail window.
  *
  * Methodology: one warmup pass (JIT, codegen caches, and the persisted
  * signature tables the dedup/ANN pipelines would keep materialized in
  * production) then THREE measured passes in sorted name order; each
  * query reports the MEDIAN of its three timings. Round 3's single
  * measured pass recorded a 1.5x phantom regression when a co-tenant
  * spiked during the driver's run — a median absorbs one bad pass.
  * Queries whose spread still exceeds max(1s, 2× median) get up to two
  * extra samples, and their stats come from the `passes` samples
  * nearest the median — so one co-tenant burst cannot dominate
  * max_spread_sec (round 4 carried a 19s spread from a single burst);
  * re-measured query names are recorded in "remeasured". Per-query
  * spread goes to bench_results.json; the summary line carries the
  * worst spread so a noisy capture is visible in the artifact itself.
  * The artifact also carries recall@10 of each approximate ANN variant
  * vs the exact baseline ("recall") and any queries left unwarmed by a
  * fatal warmup break ("cold").
  *
  * Cross-round gate policy (flag rules and committed-prior refresh,
  * both noise-aware) lives in [[BenchGate]] — pure functions, specced
  * by BenchGateSpec without a Spark session.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // Optional args: restrict to these query names (dev profiling); the
    // driver passes none → full run.
    val only = args.toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty,
      s"unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // The committed per-scale-factor prior: `bench_results.json` is
    // gitignored, so a fresh driver checkout never found a prior and the
    // regression comparison sat disabled (prev_n:0 in rounds ≤6).
    // bench_prev/<sf>.json IS committed, keyed by the sfDir basename so a
    // dev run from any path still compares like with like.
    val sfBase = new java.io.File(sfDir).getName
    val prevPath = java.nio.file.Paths.get(s"bench_prev/$sfBase.json")
    def parseQueries(txt: String): Map[String, Double] =
      """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
        .map(_.group(1)).toSeq
        .flatMap(q => """"([A-Za-z0-9_]+)":(-?[0-9.]+)""".r
          .findAllMatchIn(q).map(m => m.group(1) -> m.group(2).toDouble))
        .toMap
    // The prior is keyed by basename but records the FULL sfDir it was
    // measured on: two corpora whose dirs share a basename (/a/sf0.1 vs
    // /b/sf0.1) must not share a prior — a mismatch disables the
    // comparison (and this run's refresh then starts a fresh prior for
    // its own dir). A legacy prior without the field is accepted.
    def sfDirMatches(txt: String): Boolean =
      """"sf_dir":"([^"]*)"""".r.findFirstMatchIn(txt)
        .forall(_.group(1) == sfDir)
    // Prior run's per-query medians, read BEFORE this run overwrites the
    // artifact: cross-round regressions surface in the artifact itself
    // (round 5's comparison required hand-reconstructing truncated chunk
    // lines). Same-format file, so a targeted regex parse suffices; any
    // failure just disables the comparison. Fallback to the legacy
    // uncommitted artifact (useful for back-to-back local runs), with a
    // same-SF guard — a prior at a different scale factor would flag
    // phantom regressions on every query.
    val prev: Map[String, Double] =
      try {
        if (java.nio.file.Files.exists(prevPath)) {
          val txt = new String(
            java.nio.file.Files.readAllBytes(prevPath), "UTF-8")
          if (sfDirMatches(txt)) parseQueries(txt) else Map.empty
        } else {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get("bench_results.json")), "UTF-8")
          // Plain contains — a regex would wildcard '.' in every real
          // path and break on metacharacters.
          if (txt.contains(s""""sf":"$sfDir"""")) parseQueries(txt) else Map.empty
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Execute the query's EXACT physical plan: a count() on top would let
    // the optimizer prune unused window/projection expressions and
    // under-measure. toRdd + full iterator consumption materializes every
    // output column.
    def runFull(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreachPartition { it =>
          while (it.hasNext) it.next()
        }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only(n))
    // Warmup: non-fatal failures re-surface in the measured pass; a
    // FATAL here (OOM-class) must not kill the process before any
    // artifact exists — same contract as the measured-pass fatal path,
    // so the measured loop (skipping nothing) reproduces the fatal and
    // emits the artifact with value:-1. Queries left unwarmed by an
    // early break run COLD in the measured pass — their timings are not
    // comparable across rounds, so they are listed in the artifact's
    // "cold" field for the cross-round reader to discount.
    var cold = Seq.empty[String]
    val warm = new scala.util.control.Breaks
    warm.breakable {
      names.foreach { n =>
        try runFull(n) catch {
          case scala.util.control.NonFatal(_) =>
          case e: Throwable =>
            System.err.println(s"[bench] warmup $n FATAL: $e")
            cold = names.dropWhile(_ != n)
            warm.break()
        }
      }
    }
    // A crashed query must NOT be reported as a near-zero timing: record
    // -1 for it and list it in "failed" so the driver sees the signal.
    // Three interleaved measured passes (pass 1 of all queries, then pass
    // 2, then pass 3): a co-tenant spike lasting up to a whole pass can
    // corrupt at most one of each query's three samples, and the median
    // discards it. A query that crashes once is failed outright — no
    // retry masking.
    val passes = 3
    var failed = Set.empty[String]
    // The first failure's exception class + message, carried into the
    // artifact: round 6's artifact showed 55 `-1`s but not WHY — the
    // cause had to be re-derived by rerunning Verify by hand.
    var firstErr: Option[String] = None
    def noteErr(name: String, e: Throwable): Unit =
      if (firstErr.isEmpty) firstErr = Some(errLine(name, e))
    var fatal = false
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val loop = new scala.util.control.Breaks
    loop.breakable {
      for (_ <- 1 to passes; name <- names if !failed(name)) {
        val t0 = System.nanoTime()
        try {
          runFull(name)
          samples(name) =
            ((System.nanoTime() - t0) / 1e9) :: samples.getOrElse(name, Nil)
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            noteErr(name, e)
            failed += name
          case e: Throwable =>
            // Fatal (OOM-class): the JVM is poisoned — any further
            // timings would be garbage. Stop measuring, but still fall
            // through and EMIT the artifact (value:-1 + this query in
            // "failed"); dying here with no summary line would
            // reproduce the parsed:null failure mode this protocol
            // exists to prevent.
            System.err.println(s"[bench] $name FATAL: $e")
            noteErr(name, e)
            failed += name
            fatal = true
            loop.break()
        }
      }
    }
    // After a fatal abort, queries never reached in the first pass have
    // no samples at all — report them as failed, not as timings.
    if (fatal) failed ++= names.filterNot(samples.contains)
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.size / 2)
    }
    // Spread-triggered re-measure: a query whose three samples spread
    // wider than max(1s, 2× its median) was hit by co-tenant noise —
    // one more sample per extra pass (at most 2) tightens ITS stats
    // without re-running the whole inventory. The final median/spread
    // for a re-measured query come from the `passes` samples closest
    // to its overall median, so one absorbed burst no longer dominates
    // max_spread_sec while every raw sample stays in the artifact.
    def noisy(name: String): Boolean =
      !failed(name) && samples.get(name).exists { xs =>
        xs.size >= passes && (xs.max - xs.min) > math.max(1.0, 2 * median(xs))
      }
    var remeasured = Set.empty[String]
    if (!fatal) {
      for (_ <- 1 to 2) {
        for (name <- names if noisy(name)) {
          remeasured += name
          val t0 = System.nanoTime()
          try {
            runFull(name)
            samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
          } catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[bench] $name FAILED on re-measure: ${e.getMessage}")
              noteErr(name, e)
              failed += name
          }
        }
      }
    }
    // The `passes` samples nearest the overall median (trimmed set).
    def trimmed(name: String): List[Double] = {
      val xs = samples(name)
      val m = median(xs)
      xs.sortBy(x => math.abs(x - m)).take(passes)
    }
    val results = names.map { name =>
      name -> (if (failed(name)) -1.0 else median(trimmed(name)))
    }
    val spreads = names.collect {
      case name if !failed(name) && samples(name).size >= passes =>
        val t = trimmed(name)
        name -> (t.max - t.min)
    }
    // Approximate-query quality, computed inside the bench run — row
    // counts (the only driver-side signal for no-oracle queries) cannot
    // catch an index/bucketing regression; these numbers can. Tiny
    // collects: tens-to-hundreds of id pairs per query.
    // One mechanism for every no-oracle approximate query with an exact
    // twin in the inventory: recall of its id-pair set vs the baseline's,
    // keyed by the two given id columns. The ANN variants compare
    // (query_id, neighbor_id) against the exact scan; SemDeDup compares
    // (id_a, id_b) against the exact cosine pass.
    def recallOf(exactName: String, variants: Seq[String],
        keyCols: Seq[String]): Seq[(String, Double)] =
      if (!fatal && !failed(exactName) && names.contains(exactName))
        try {
          def pairs(q: String): Set[(Long, Long)] =
            SparkEntry.queries(q)(spark, sfDir)
              .select(keyCols.head, keyCols.tail: _*).collect()
              .map(r => (r.getLong(0), r.getLong(1))).toSet
          val exact = pairs(exactName)
          // An empty exact baseline (corpus smaller than the query set)
          // would make recall 0/0 = NaN, which f3 renders literally and
          // breaks the JSON artifact — skip recall instead.
          if (exact.isEmpty) Seq.empty
          else variants.filter(v => names.contains(v) && !failed(v)).map { q =>
            q -> pairs(q).count(exact.contains).toDouble / exact.size
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"[bench] recall vs $exactName failed: ${e.getMessage}")
            Seq.empty
        }
      else Seq.empty
    val recall =
      recallOf("ann_topk_exact",
        Seq("ann_topk_lsh", "ann_topk_ivf", "ann_topk_pq",
          "ann_topk_ivfpq"),
        Seq("query_id", "neighbor_id")) ++
      recallOf("dd_cosine_neardup", Seq("dd_semantic"), Seq("id_a", "id_b"))
    // Cross-round regressions — policy in [[BenchGate.regressionFlags]]:
    // >1.5× slower AND delta above max(0.5s, 3× the query's own spread).
    // The spread term is what the round-7 artifact showed missing: all
    // three of its flags had per-query spread ≥ their delta (phantoms
    // from a 6.9s-spread co-tenant window), while a real shift — the
    // deliberate PQ k=32 retune — had spread ≪ delta and still flags.
    // Cold queries (unwarmed after a warmup fatal) are excluded: their
    // timings are not comparable across rounds by this file's own
    // contract, so a cold 1.8s vs a prior warm 1.0s must not read as a
    // regression.
    val regressions =
      BenchGate.regressionFlags(results, prev, spreads.toMap, cold)
    // Locale.ROOT: f"%.3f" uses the JVM default locale, and a
    // comma-decimal locale would emit invalid JSON.
    def f3(v: Double): String =
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qJson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson =
      failed.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // A run with failures must never have its total compared against a
    // clean run's (the missing queries would read as a speedup): value is
    // -1 unless every query completed; "completed"/"n" carry the counts.
    val value = if (failed.isEmpty) f3(total) else "-1"
    // Worst per-query spread: if this rivals the query timings themselves
    // the capture was noisy and the total shouldn't be trusted blindly.
    val maxSpread = if (spreads.isEmpty) 0.0 else spreads.map(_._2).max
    val recallJson = qJson(recall)
    val coldJson = cold.map("\"" + _ + "\"").mkString("[", ",", "]")
    val remeasuredJson =
      remeasured.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Summary carries at most 8 regressed names (it must stay inside the
    // driver's ~2 KB tail window); the full ratio map is in the on-disk
    // artifact. "prev_n":0 distinguishes "no prior run" from "no
    // regressions".
    // Subset (dev) runs write a SIDE file: overwriting the full-run
    // artifact with a partial query map would destroy the baseline the
    // next round's regression comparison reads.
    val artifact =
      if (only.isEmpty) "bench_results.json" else "bench_results_subset.json"
    val regSummaryJson = regressions.toSeq.sortBy(-_._2).take(8)
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val regFullJson = qJson(regressions.toSeq.sortBy(-_._2))
    // First failure cause, JSON-escaped — so a red artifact says WHY in
    // the artifact itself. Length is bounded by errLine BEFORE escaping:
    // truncating the escaped form could split an escape pair and emit
    // an unterminated string, corrupting the whole summary line.
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val firstErrJson = firstErr.map(jstr).getOrElse("null")
    val summary =
      s"""{"metric":"total","value":$value,"unit":"sec","n":${names.size},"completed":${names.size - failed.size},"total_sec":${f3(total)},"passes":$passes,"stat":"median","max_spread_sec":${f3(maxSpread)},"recall":$recallJson,"regressions_vs_prev":$regSummaryJson,"prev_n":${prev.size},"failed":$failedJson,"first_error":$firstErrJson,"sf":"$sfDir","detail":"$artifact"}"""
    // Chunk timings into standalone JSON lines of ~600 bytes each.
    val chunks = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      var len = 0
      results.foreach { kv =>
        val entryLen = kv._1.length + 12
        if (len + entryLen > 600 && cur.nonEmpty) {
          buf += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty; len = 0
        }
        cur += kv; len += entryLen
      }
      if (cur.nonEmpty) buf += cur.toSeq
      buf.toSeq
    }
    val fullLine =
      s"""{"metric":"total","value":$value,"unit":"sec","n":${names.size},"completed":${names.size - failed.size},"total_sec":${f3(total)},"passes":$passes,"stat":"median","max_spread_sec":${f3(maxSpread)},"queries":${qJson(results)},"spread":${qJson(spreads)},"recall":$recallJson,"regressions_vs_prev":$regFullJson,"prev_n":${prev.size},"remeasured":$remeasuredJson,"cold":$coldJson,"failed":$failedJson,"first_error":$firstErrJson,"sf":"$sfDir"}"""
    // Complete results on disk survive any stdout truncation — written
    // BEFORE spark.stop(), which may itself wedge in a poisoned JVM.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(artifact),
      (fullLine + "\n").getBytes("UTF-8"))
    // Refresh the committed prior for the NEXT run's regression gate —
    // policy in [[BenchGate.mergedPrior]]: a fatal run never writes, a
    // quiet run's medians replace the prior, a NOISY run (max spread >
    // 1s, like the round-7 driver window that baked a 1.7×-inflated
    // dd_ngram_jaccard median into the gate) only merges per-query
    // minima, so co-tenant inflation cannot overwrite quiet baselines.
    // Merging over the existing prior means a query that failed this
    // time keeps its last good number (round 6's 55 dark queries would
    // otherwise have erased their priors). Full runs only — a dev
    // subset must not shrink the baseline. COLD timings are excluded
    // for the same reason they are excluded from the regression check.
    if (only.isEmpty)
      BenchGate.mergedPrior(prev, results, cold, maxSpread, fatal).foreach {
        merged =>
          try {
            val mergedJson = qJson(merged.toSeq.sortBy(_._1))
            java.nio.file.Files.createDirectories(prevPath.getParent)
            java.nio.file.Files.write(prevPath,
              (s"""{"sf":"$sfBase","sf_dir":"$sfDir","queries":$mergedJson}""" +
                "\n").getBytes("UTF-8"))
          } catch { case scala.util.control.NonFatal(e) =>
            System.err.println(s"[bench] prior write failed: $e")
          }
      }
    spark.stop()
    // After spark.stop() so no stray executor logging lands after it; the
    // short summary line goes LAST so the tail window always contains it.
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"part":${i + 1},"of":${chunks.size},"queries":${qJson(c)}}""")
    }
    println(summary)
  }
}
