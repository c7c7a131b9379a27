package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends GraftSuite {

  test("corpus pipeline: batch flow and streaming twin produce identical corpora") {
    // Corpus = the pinned documents + injected exact duplicates (the
    // pinned corpus has near-dups but no exact dups, so without the
    // injection the dedup stage would be a no-op and prove nothing).
    val docs = Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val dups = docs.orderBy("doc_id").limit(40)
      .withColumn("doc_id", col("doc_id") + maxId + 1)
    val corpus = docs.unionByName(dups)
    val nCorpus = corpus.count()
    val base = Files.createTempDirectory("graft_corpus").toString

    // ---- batch flow from gzip JSONL
    corpus.write.option("compression", "gzip").json(s"$base/jsonl")
    val batchWh = s"$base/wh_batch"
    val report = pipeline.CorpusPipeline.runBatch(spark, s"$base/jsonl", batchWh)
    assert(report.succeeded, report.toString)
    val nRaw = spark.read.parquet(s"$batchWh/raw/documents.parquet").count()
    val nCur = spark.read.parquet(s"$batchWh/curated/documents.parquet").count()
    val nUniq = spark.read.parquet(s"$batchWh/unique/documents.parquet").count()
    assert(nRaw == nCorpus)
    assert(nCur < nRaw, "quality gate did not drop anything")
    assert(nUniq < nCur, "dedup did not drop the injected duplicates")
    // keep-first: every injected copy lost to its lower-id original
    val keptIds = spark.read.parquet(s"$batchWh/unique/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds.forall(_ <= maxId), "an injected duplicate won keep-first")

    // ---- streaming twin from 4 ordered parquet drops: ascending doc_id
    // ranges with strictly increasing mtimes (FileStreamSource processes
    // oldest-first), so first-arrival == min doc_id == batch keep-first.
    val ids = corpus.select("doc_id").orderBy("doc_id").collect()
      .map(_.getLong(0))
    val cuts = Seq(ids(ids.length / 4), ids(ids.length / 2),
      ids(3 * ids.length / 4))
    val dropsDir = new java.io.File(s"$base/drops")
    assert(dropsDir.mkdirs())
    val ranges = (Long.MinValue +: cuts :+ Long.MaxValue).sliding(2).toSeq
    ranges.zipWithIndex.foreach { case (Seq(lo, hi), i) =>
      val tmp = s"$base/tmp_drop_$i"
      corpus.filter(col("doc_id") > lo && col("doc_id") <= hi)
        .coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dropsDir, f"drop-$i%02d.parquet")
      Files.copy(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    val streamWh = s"$base/wh_stream"
    val sReport = pipeline.CorpusPipeline
      .runStreamingTwin(spark, s"$base/drops", streamWh)
    assert(sReport.succeeded, sReport.toString)

    // ---- end-to-end equality of every shared artifact
    def rows(p: String, order: String*) = spark.read.parquet(p)
      .orderBy(order.map(col): _*).collect().map(_.toString).toSeq
    assert(rows(s"$streamWh/unique/documents.parquet", "doc_id") ==
      rows(s"$batchWh/unique/documents.parquet", "doc_id"))
    assert(rows(s"$streamWh/linededup/documents.parquet", "doc_id") ==
      rows(s"$batchWh/linededup/documents.parquet", "doc_id"))
    assert(rows(s"$streamWh/splits/assignments.parquet", "doc_id") ==
      rows(s"$batchWh/splits/assignments.parquet", "doc_id"))
    assert(rows(s"$streamWh/screened/documents.parquet", "doc_id") ==
      rows(s"$batchWh/screened/documents.parquet", "doc_id"))
    assert(rows(s"$streamWh/packed/sequences.parquet", "shard", "doc_id") ==
      rows(s"$batchWh/packed/sequences.parquet", "shard", "doc_id"))

    // the pack stage packed exactly the SCREENED train split: train
    // docs minus those sharing a word 5-gram with the held-out test
    // split (re-derived independently here)
    val splits = spark.read.parquet(s"$batchWh/splits/assignments.parquet")
    val bySplit = splits.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // the split/screen/pack stages run on the LINE-DEDUPED corpus
    val uniqueText = spark.read
      .parquet(s"$batchWh/linededup/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // Independent re-derivation of the screen, including the
    // canonicalization the gram keys apply (lowercase, strip
    // punctuation, collapse whitespace).
    def grams(t: String): Set[String] = {
      val n = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim
      val w = n.split(" ", -1)
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val testGrams = uniqueText.filter(d => bySplit(d._1) == "test")
      .flatMap(d => grams(d._2)).toSet
    val cleanTrain = uniqueText
      .filter(d => bySplit(d._1) == "train")
      .filter(d => !grams(d._2).exists(testGrams))
      .map(_._1).toSet
    val screenedIds = spark.read
      .parquet(s"$batchWh/screened/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val packedIds = spark.read.parquet(s"$batchWh/packed/sequences.parquet")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(screenedIds == cleanTrain)
    assert(packedIds == screenedIds)
    // every line-deduped doc got an assignment; line dedup never grows
    // the corpus (it may drop fully-deduplicated docs)
    val nLine = spark.read
      .parquet(s"$batchWh/linededup/documents.parquet").count()
    assert(splits.count() == nLine)
    assert(nLine <= nUniq)
  }

  test("decontamination screen catches case/whitespace-reformatted benchmark copies") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    // A benchmark (bucket >= 90) doc long enough to carry 5-grams.
    val benchDoc = docs.filter(operators.CorpusOps.splitBucket >= 90)
      .filter(size(split(col("text"), " ")) >= 5)
      .select("doc_id", "text").orderBy("doc_id").first()
    val original = benchDoc.getString(1)
    // Trivially-reformatted contamination: case changed and whitespace
    // doubled — no shared RAW 5-gram with the original (proved below),
    // which is exactly the copy a raw-space screen lets through.
    val reformatted = original.toUpperCase.replace(" ", "  ")
    def rawGrams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 5) Set.empty else w.sliding(5).map(_.mkString(" ")).toSet
    }
    assert(rawGrams(reformatted).intersect(rawGrams(original)).isEmpty,
      "reformatting failed to change the raw gram keys")
    val batch = Seq(
      (900001L, reformatted), // contaminated: same text after normText
      (900002L, "qq ww ee rr tt yy uu ii oo pp")) // control: unrelated
      .toDF("doc_id", "text")
    val kept = operators.CorpusOps
      .screenClean(batch, operators.CorpusOps.benchGramSet(docs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(900001L),
      "a case/whitespace-changed benchmark copy slipped the screen")
    assert(kept.contains(900002L), "the screen dropped an unrelated doc")
  }

  test("streaming decontamination screen equals the batch screen across micro-batches") {
    val base = Files.createTempDirectory("graft_decon").toString
    // 4 source files → 4 micro-batches with maxFilesPerTrigger=1
    Tables.documents(spark, sf)
      .repartition(4).write.parquet(s"$base/src")
    streaming.StreamingDecontaminate.screen(spark, s"$base/src", sf,
      s"$base/out", maxFilesPerTrigger = 1)
    val streamed = spark.read.parquet(s"$base/out")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // batch twin: same shared screen over the whole table at once
    val docs = Tables.documents(spark, sf)
    val batch = operators.CorpusOps
      .screenClean(docs, operators.CorpusOps.benchGramSet(docs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // the screen genuinely dropped leakage: every pp_decontaminate hit
    // (a TRAIN doc sharing a benchmark 5-gram) is absent from the clean set
    val flagged = SparkEntry.queries("pp_decontaminate")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.nonEmpty && flagged.forall(id => !streamed.contains(id)))
    // benchmark docs screen THEMSELVES out (full 5-gram self-overlap)
    val benchIds = docs.filter(operators.CorpusOps.splitBucket >= 90)
      .filter(size(split(col("text"), " ")) >= 5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(benchIds.forall(id => !streamed.contains(id)))
  }

  test("fixed-k sample: exactly min(k, source size) docs per source, stable") {
    val rows = SparkEntry.queries("pp_fixed_k")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val perSource = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.groupBy(_._2).view.mapValues(_.length).toMap
    perSource.foreach { case (src, n) =>
      assert(got.getOrElse(src, 0) == math.min(8L, n).toInt,
        s"source $src: expected min(8, $n) docs")
    }
    // ranks within each source are exactly 1..k, and a re-run is identical
    rows.groupBy(_._2).foreach { case (src, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, src)
    }
    val again = SparkEntry.queries("pp_fixed_k")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(again == rows.map(r => (r._1, r._3)).toSet)
  }
}
