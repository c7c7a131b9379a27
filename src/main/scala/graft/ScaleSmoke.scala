package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-smoke utility: replicates the events table `factor`× (unique
  * synthetic user/event ids, written once to a scratch dir) and times the
  * flagship plans on it. This is a dev/scale experiment, not part of the
  * driver contract — it answers "does the plan shape survive 100× data"
  * with measurements instead of claims.
  *
  * Usage: runMain graft.ScaleSmoke [factor] [srcSfDir] [scratchDir]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val scratch = args.lift(2).getOrElse("/tmp/graft_scale_events")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = new java.io.File(scratch)
    if (!dir.exists()) {
      val e = Tables.events(spark, src)
      e.crossJoin(spark.range(0, factor).select(col("id").as("rep")))
        .select(
          (col("event_id") + col("rep") * 1000000000L).as("event_id"),
          col("ts"),
          (col("user_id") + col("rep") * 1000000L).as("user_id"),
          col("event_type"), col("value"))
        .repartition(cpus.toInt * 2)
        .write.mode("overwrite").parquet(scratch)
    }
    val big = spark.read.parquet(scratch)
    val rows = big.count()

    // Materialize the exact plan (count() would prune window exprs).
    def full(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) it.next()
      }
      0L
    }
    def time(name: String)(f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      (name, (System.nanoTime() - t0) / 1e9, n)
    }

    import org.apache.spark.sql.expressions.Window
    val wp = Window.partitionBy("user_id")
    val wo = wp.orderBy(col("ts"), col("event_id"))
    val results = Seq(
      time("wf_features") {
        full(big.select(col("user_id"), col("event_id"),
          (max(col("value")).over(wp) - col("value")).as("rul"),
          avg(col("value")).over(wo.rowsBetween(-4, 0)).as("mean5"),
          avg(col("value")).over(wo.rowsBetween(-19, 0)).as("mean20"),
          (col("value") - lag(col("value"), 1).over(wo)).as("d"),
          (col("value") - avg(col("value")).over(wp)).as("dev")))
      },
      time("grouped_agg") {
        full(big.groupBy("user_id", "event_type")
          .agg(count(lit(1)), sum(col("value")), max(col("value"))))
      },
      time("topk") { full(big.orderBy(col("value").desc).limit(100)) },
      time("distinct_users") {
        big.agg(countDistinct(col("user_id"))).first().getLong(0)
      },
      // Round-2 ops at scale: merge-based as-of join (one shuffle) and
      // native session_window (agg-operator session state).
      time("asof_join") {
        // The SAME plan the j5_asof_join query ships, on the scaled table.
        full(operators.Extended.asofLastError(
          big.select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("tus"), col("event_type"))))
      },
      time("session_window") {
        full(big.groupBy(col("user_id"),
            session_window(col("ts"), "24 hours"))
          .agg(count(lit(1)).as("n"), sum(col("value")).as("sv")))
      },
      // Round-4: gap-fill at 100× — the grid is users × days (at
      // factor=100 that is ~1.5M users, so the grid itself is tens of
      // millions of rows) and the fill window is one pass per user.
      time("gap_fill") {
        full(operators.Extended.gapFill(big.select(col("user_id"),
          to_date(col("ts")).as("day"), col("value"))))
      },
      // Round-5: rolling median at 100× — same bounded 5-row frame as
      // the w16 query; per-row state is 5 values regardless of scale.
      time("rolling_median") {
        val w = Window.partitionBy("user_id")
          .orderBy(unix_micros(col("ts")), col("event_id"))
          .rowsBetween(-4, 0)
        val arr = sort_array(collect_list(col("value")).over(w))
        val n = size(arr)
        val med = when(n === 0, lit(null).cast("double"))
          .when(n % 2 === 1, element_at(arr, ((n + 1) / 2).cast("int")))
          .otherwise((element_at(arr, (n / 2).cast("int")) +
            element_at(arr, (n / 2 + 1).cast("int"))) / 2.0)
        full(big.select(col("event_id"), round(med, 6).as("med5")))
      })
    // Skew stress: collapse every even user_id onto ONE key, putting
    // ≥50% of all rows on it, then join against a dim too large to
    // broadcast (one row per distinct key). Three measurements tell the
    // whole story the Skew scaladoc claims:
    //   skew_join_aqe     — plain shuffle join, AQE skew split ON
    //                       (default): the runtime fix.
    //   skew_join_noaqe   — same plan with skew splitting OFF: the
    //                       single-straggler baseline, i.e. what happens
    //                       in the shapes AQE cannot rewrite.
    //   skew_join_salted  — Skew.saltedJoin under the same OFF setting:
    //                       the explicit fallback must recover the AQE
    //                       time despite replicating the dim `buckets`×.
    // Result equality of all three is spec-pinned (ExtensionsAndScale);
    // here only wall time matters. The salted-agg pair shows why
    // saltedSum is a FALLBACK: map-side partial aggregation already
    // collapses a hot sum/count key per task, so plain≈salted for
    // decomposable aggregates even at 50% skew.
    val skewed = big.withColumn("hk",
      when(pmod(col("user_id"), lit(2)) === 0, lit(-1L))
        .otherwise(col("user_id")))
      .select(col("event_id"), col("hk"), col("value"))
    val skewDim = skewed.select(col("hk")).distinct()
      .withColumn("key_tag", md5(col("hk").cast("string")))
    def withSkewSplit[T](on: Boolean)(f: => T): T = {
      val k = "spark.sql.adaptive.skewJoin.enabled"
      val prev = spark.conf.get(k)
      spark.conf.set(k, on.toString)
      try f finally spark.conf.set(k, prev)
    }
    val skewResults = Seq(
      // hint("merge") pins the sort-merge shape the experiment is about:
      // at 100 TB this dim does not broadcast, and letting AQE demote
      // the small local stand-in to a broadcast join would measure
      // nothing.
      time("skew_join_aqe") {
        withSkewSplit(on = true) {
          full(skewed.join(skewDim.hint("merge"), "hk"))
        }
      },
      time("skew_join_noaqe") {
        withSkewSplit(on = false) {
          full(skewed.join(skewDim.hint("merge"), "hk"))
        }
      },
      time("skew_join_salted") {
        withSkewSplit(on = false) {
          full(operators.Skew.saltedJoin(skewed, skewDim, "hk"))
        }
      },
      time("skew_agg_plain") {
        full(skewed.groupBy("hk")
          .agg(sum(col("value")).as("s"), count(lit(1)).as("c")))
      },
      time("skew_agg_salted") {
        full(operators.Skew.saltedSum(skewed, Seq("hk"), "value"))
      })

    // Dedup stress: replicate documents 10x with unique ids — every text
    // becomes a 10-doc duplicate cluster, the worst (pair-heavy) shape a
    // dup-laden corpus produces. Uses a scratch table dir; the dedup
    // operators read it through the same code paths as the sf tables.
    val docScratch = s"$scratch-docs"
    if (!new java.io.File(docScratch).exists()) {
      val docs = Tables.documents(spark, src)
      val n = docs.count()
      docs.crossJoin(spark.range(0, 10).select(col("id").as("rep")))
        .select((col("doc_id") + col("rep") * n * 10L).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$docScratch/documents.parquet")
    }
    val dedupResults = Seq(
      time("dd_minhash_10x") {
        SparkEntry.queries("dd_minhash_lsh")(spark, docScratch).count()
      },
      time("dd_simhash_pairs_10x") {
        SparkEntry.queries("dd_simhash_pairs")(spark, docScratch).count()
      },
      time("dd_jaccard_10x") {
        SparkEntry.queries("dd_ngram_jaccard")(spark, docScratch).count()
      },
      time("ta_bigrams_10x") {
        SparkEntry.queries("ta_bigrams")(spark, docScratch).count()
      },
      // Round-4 ops on the same dup-heavy corpus: passage coverage
      // (every doc fully duplicated → the dictionary join carries the
      // worst case) and incremental screening (nearly every incoming
      // doc is a true dup → the bloom prefilter passes ~everything and
      // the verify join sees its maximum input).
      time("dd_span_coverage_10x") {
        SparkEntry.queries("dd_span_coverage")(spark, docScratch).count()
      },
      time("dd_incremental_10x") {
        SparkEntry.queries("dd_incremental")(spark, docScratch).count()
      },
      // Bounded-state sketch and shard-parallel packing on the same
      // corpus: the sketch shuffles k-entry maps regardless of scale;
      // packing windows run one pass per md5 shard.
      time("ta_heavy_hitters_10x") {
        SparkEntry.queries("ta_heavy_hitters")(spark, docScratch).count()
      },
      time("pp_pack_10x") {
        SparkEntry.queries("pp_pack")(spark, docScratch).count()
      },
      // Round-5: the cluster pipeline's tail on the same worst-case
      // corpus — every text is a 10-doc clique, so label propagation
      // and the per-cluster keep-best window see their densest input.
      time("pp_cluster_split_10x") {
        SparkEntry.queries("pp_cluster_split")(spark, docScratch).count()
      },
      time("dd_keep_best_10x") {
        SparkEntry.queries("dd_keep_best")(spark, docScratch).count()
      },
      // Decontamination on the dup-heavy corpus is its worst case: every
      // clique spans the md5 split boundary with high probability, so
      // nearly every training doc shares 5-grams with the benchmark
      // side — the broadcast gram set and the per-doc count agg both see
      // their maximum load.
      time("pp_decontaminate_10x") {
        SparkEntry.queries("pp_decontaminate")(spark, docScratch).count()
      },
      time("pp_domain_mix_10x") {
        SparkEntry.queries("pp_domain_mix")(spark, docScratch).count()
      })

    // Tiled exact 1-NN at 10× the vector corpus (20k vectors → 400M
    // scored pairs): the per-tile kernel emits one row per (probe,
    // tile) and the merge shuffles one row per vector — the plan shape
    // that replaces the whole-corpus broadcast past 200k vectors.
    val vecScratch = s"$scratch-vecs"
    if (!new java.io.File(vecScratch).exists()) {
      val v = Tables.embeddings(spark, src)
      val n = v.count()
      v.crossJoin(spark.range(0, 10).select(col("id").as("rep")))
        .select((col("vec_id") + col("rep") * n * 10L).as("vec_id"),
          col("embedding"), col("label"))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$vecScratch/embeddings.parquet")
    }
    val knnResults = Seq(
      time("knn_tiled_10x") {
        operators.Similarity.knnSelfTiled(spark, vecScratch, 4).count()
      },
      // SemDeDup at 10× vectors: centroid training + within-cell pairs.
      // The within-cell candidate volume grows as (N/cells)² per cell —
      // the number to watch is time relative to knn_tiled's full N².
      time("dd_semantic_10x") {
        SparkEntry.queries("dd_semantic")(spark, vecScratch).count()
      })

    // Streaming dedup throughput at the same 10x dup-heavy scale: the
    // replicated documents dir becomes a file-source stream (8 files per
    // trigger → several micro-batches), state = one flag per distinct
    // digest. Measures end-to-end micro-batch throughput including state
    // store maintenance.
    val streamResults = Seq(
      time("stream_dedup_10x") {
        streaming.StreamingDedup.runToMemory(spark,
          s"$docScratch/documents.parquet", "scale_stream_dedup",
          maxFilesPerTrigger = 8)
        spark.table("scale_stream_dedup").count()
      })

    val qs = (results ++ skewResults ++ dedupResults ++ knnResults ++
      streamResults)
      .map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val pairCounts = dedupResults.map { case (k, _, n) => s""""$k":$n""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","rows":$rows,"factor":$factor,"queries":$qs,"dedup_pairs":$pairCounts}""")
    spark.stop()
  }
}
