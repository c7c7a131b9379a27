package graft

import org.apache.spark.sql.functions._

class TextAndMultimodalSpec extends GraftSuite {

  test("quality metrics are internally consistent") {
    val rows = SparkEntry.queries("ta_quality")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getInt(2); val nDistinct = r.getInt(3)
      assert(nDistinct <= nWords)
      val ttr = r.getDouble(4)
      assert(math.abs(ttr - nDistinct.toDouble / nWords) < 1e-5)
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1) // stop_ratio
    }
  }

  test("fingerprint collides for planted near-dup pairs") {
    val dupPairs = SparkEntry.queries("dd_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fp = SparkEntry.queries("ta_fingerprint")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // min-hash fingerprint collides with prob ~= jaccard; at j>=0.95
    // expect most planted pairs to collide
    val hits = dupPairs.count { case (a, b) => fp(a) == fp(b) }
    assert(dupPairs.isEmpty || hits.toDouble / dupPairs.length >= 0.7,
      s"$hits/${dupPairs.length} fingerprint collisions")
  }

  test("langid predictions are deterministic and within the lang set") {
    val langs = Set("en", "es", "de", "fr", "zh")
    val r1 = SparkEntry.queries("ta_langid")(spark, sf).collect()
    assert(r1.forall(r => langs.contains(r.getString(7))))
  }

  test("token counts: regex tokens <= whitespace tokens for this corpus") {
    val rows = SparkEntry.queries("ta_tokens")(spark, sf).collect()
    assert(rows.forall(r => r.getInt(2) >= 1 && r.getInt(1) >= 1))
  }

  test("multimodal: batched extraction is deterministic, fixed-dim, 1:1") {
    val media = operators.Multimodal.mediaTable(spark, sf)
    val f1 = operators.Multimodal.extractFeatures(media).collect()
      .sortBy(_.media_id)
    val f2 = operators.Multimodal.extractFeatures(media).collect()
      .sortBy(_.media_id)
    assert(f1.length == media.count())
    assert(f1.forall(_.feature.length == 8))
    assert(f1.zip(f2).forall { case (a, b) =>
      a.media_id == b.media_id && a.feature.toSeq == b.feature.toSeq })
  }

  test("multimodal: partitioning is preserved (no implicit coalesce)") {
    val media = operators.Multimodal.mediaTable(spark, sf).repartition(7)
    val out = operators.Multimodal.extractFeatures(media)
    assert(out.rdd.getNumPartitions == 7)
  }
}
