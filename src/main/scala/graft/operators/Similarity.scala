package graft.operators

import graft._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the embeddings table.
  *
  *  - [[annTopkExact]]: brute-force cosine top-k for a query set — the
  *    correctness baseline (oracle-checked). Queries are broadcast; the
  *    corpus is scanned once, so at 100 TB this is one narrow pass +
  *    per-query top-k (TakeOrdered shape), not an all-pairs shuffle.
  *  - [[annTopkLsh]]: random-hyperplane LSH variant — the scale path.
  *    Sign-bit signatures bucket the corpus; only bucket-mates are
  *    scored. Deterministic planes (md5-derived), no oracle (approximate
  *    by construction); recall vs the exact baseline is spec-tested.
  */
object Similarity {

  private val K = 10
  private val NumQueries = 10 // vec_id < 10 are the query vectors

  /** L2-normalized double vectors. */
  private def normalized(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("nrm", sqrt(aggregate(col("e"), lit(0.0), (a, x) => a + x * x)))
      .select(col("vec_id"), transform(col("e"), x => x / col("nrm")).as("u"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Exact brute-force top-k cosine neighbors for each query vector. */
  def annTopkExact(s: SparkSession, d: String): DataFrame = {
    val v = normalized(s, d)
    val q = v.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
    val scored = v.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        r6(dot(col("qu"), col("u"))).as("cos"))
    scored
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rnk") <= K)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
      .orderBy("query_id", "rnk")
  }

  // ------------------------------------------------ LSH-bucketed variant

  private val NumPlanes = 16
  private val LshBands = 4 // 4 bands × 4 sign bits

  /** Deterministic pseudorandom hyperplanes: weight (p, i) is derived from
    * md5 so any engine/restart reproduces them. Driver-side constants
    * (like config), not data.
    */
  private[graft] def planes(dim: Int): Array[Array[Double]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumPlanes, dim) { (p, i) =>
      val h = mdig.digest(s"$p:$i".getBytes("UTF-8"))
      val v = java.nio.ByteBuffer.wrap(h).getInt & 0xFFFFFFFFL
      v.toDouble / 4294967296.0 * 2 - 1
    }
  }

  /** ANN via random-hyperplane LSH: 16 sign bits per vector, banded 4×4;
    * candidates are bucket-mates in any band, re-ranked by exact cosine.
    * The join key is (band, 4-bit bucket) — bounded fan-out, no all-pairs.
    */
  def annTopkLsh(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.embeddings(s, d).select(size(col("embedding")))
      .first().getInt(0)
    val pl = planes(dim)
    val v = normalized(s, d)
    val sigBits: Column = (0 until NumPlanes).map { p =>
      val w = typedlit(pl(p).toSeq)
      when(dot(col("u"), w) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = v.withColumn("sig", sigBits)
    val banded = sig.select(col("vec_id"), col("u"),
      posexplode(array((0 until LshBands).map(b =>
        shiftrightunsigned(col("sig"), b * 4).bitwiseAND(lit(0xFL))): _*))
        .as(Seq("band_idx", "bucket")))
    val q = banded.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("query_id"), col("u").as("qu"),
        col("band_idx"), col("bucket"))
    val cand = banded.join(q, Seq("band_idx", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("qu"), col("vec_id").as("neighbor_id"), col("u"))
      .dropDuplicates("query_id", "neighbor_id")
    cand.select(col("query_id"), col("neighbor_id"),
      r6(dot(col("qu"), col("u"))).as("cos"))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id"))))
      .filter(col("rnk") <= K)
      .select(col("query_id"), col("rnk"), col("neighbor_id"), col("cos"))
      .orderBy("query_id", "rnk")
  }

  val queries: Map[String, Query] = Map(
    "ann_topk_exact" -> (annTopkExact _),
    "ann_topk_lsh" -> (annTopkLsh _))

  /** ann_topk_lsh is approximate by construction → rows-only check. */
  val oracle: Map[String, String] = Map(
    "ann_topk_exact" ->
      s"""WITH v AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]), x -> x /
         |      sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), y -> y * y)))) AS u
         |  FROM embeddings),
         |q AS (SELECT vec_id AS query_id, u AS qu FROM v WHERE vec_id < $NumQueries),
         |scored AS (SELECT query_id, v.vec_id AS neighbor_id,
         |  round(list_sum(list_transform(range(1, len(qu) + 1), i -> qu[i] * u[i])), 6) AS cos
         |  FROM v CROSS JOIN q WHERE v.vec_id <> query_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |  CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id) AS INT) AS rnk FROM scored)
         |SELECT query_id, rnk, neighbor_id, cos FROM ranked WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin)
}
