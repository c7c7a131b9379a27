package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-corpus generators shared by the scale experiments
  * ([[ScaleSmoke]], [[GrowthGate]]). All growth is DETERMINISTIC
  * (sin-hash mixtures, md5 id arithmetic — no RNG) so runs are
  * reproducible and resumable, and all id remapping preserves
  * referential integrity WITHIN a replica (joins behave exactly like a
  * partition-wise scale-up; cross-replica keys never collide).
  */
object ScaleData {

  /** `factor`× the embeddings table by seeded manifold mixtures —
    * NATURAL growth, not clone replication (round-6 verdict: recall on
    * a clone-replicated corpus is trivially easy — every true neighbor
    * is an exact duplicate). Reps 1..factor-1 interpolate each base
    * vector with a deterministic partner (α ∈ [0.25, 0.95]) plus small
    * per-dim jitter, then re-normalize — new points lie ON the corpus
    * manifold but are nobody's duplicate, so index recall is measured
    * against genuinely novel neighbors.
    */
  def grownVectors(spark: SparkSession, src: String, factor: Int): DataFrame = {
    val v = Tables.embeddings(spark, src).select("vec_id", "embedding", "label")
    val n = v.count()
    // The modular partner pairing below requires DENSE 0..n-1 ids — on
    // sparse ids the inner join would silently DROP grown rows and every
    // scaled stage would run undersized while still labeled `factor`×.
    // Fail loudly instead if the driver ever changes id assignment.
    // getAs[Number]: the schema contract allows int OR bigint vec_id,
    // and the guard must report sparse ids, not a ClassCastException.
    val r0 = v.agg(min(col("vec_id")), max(col("vec_id"))).collect().head
    val (idLo, idHi) =
      (r0.getAs[Number](0).longValue, r0.getAs[Number](1).longValue)
    require(idLo == 0L && idHi == n - 1,
      s"embeddings ids not dense 0..${n - 1} (found $idLo..$idHi): " +
        "the partner pairing would drop grown rows")
    val partnerSide = v.select(col("vec_id").as("partner"),
      col("embedding").as("p_embedding"))
    // offset in [1, n-1] — never 0 mod n, so no vector partners with
    // itself (a self-mix would be a near-clone, defeating the
    // natural-growth premise for reps where n divides 137·rep).
    val grown = v
      .crossJoin(spark.range(1, factor.toLong).select(col("id").as("rep")))
      .withColumn("partner",
        (col("vec_id") + (col("rep") * 137L) % (n - 1) + 1L) % n)
      .join(partnerSide, "partner")
      .withColumn("alpha",
        expr("0.6 + 0.35 * sin(1.7 * vec_id + 3.1 * rep)"))
      .withColumn("mix", expr(
        """transform(sequence(0, size(embedding) - 1), j ->
          |  element_at(embedding, j + 1) * alpha
          |  + element_at(p_embedding, j + 1) * (1.0 - alpha)
          |  + 0.02 * sin(12.9898 * vec_id + 78.233 * rep + 0.77 * j))
          |""".stripMargin))
      .withColumn("nrm",
        expr("sqrt(aggregate(mix, 0d, (a, x) -> a + x * x))"))
      .select(
        (col("vec_id") + col("rep") * n * factor).as("vec_id"),
        expr("cast(transform(mix, x -> x / nrm) as array<float>)")
          .as("embedding"),
        col("label"))
    v.unionByName(grown)
  }

  /** Write a full `factor`× warehouse (every TESTDATA table) under
    * `outDir`, for whole-inventory scale measurement ([[GrowthGate]]).
    * Idempotent: skips generation when the dir already exists.
    *
    * Replication strategy per table family:
    *  - region/nation: fixed small dims, copied as-is (a 10× corpus
    *    does not invent new nations; foreign keys into them stay valid).
    *  - customer/supplier/part/orders/lineitem/events: each replica
    *    shifts every SURROGATE key (custkey, orderkey, partkey,
    *    suppkey, event_id, user_id) by rep·base with base = the
    *    table's row count (ids are dense 0..n-1, asserted) — joins
    *    resolve within a replica exactly as at 1×, so join/agg
    *    selectivities are scale-invariant.
    *  - documents: replicas get every TOKEN suffixed with the replica
    *    id, so clones are NOT near-duplicates of their originals — the
    *    corpus's planted dup structure replicates linearly instead of
    *    forming factor-sized cliques whose pair output would grow
    *    quadratically and masquerade as a plan regression in the
    *    growth numbers. (ScaleSmoke's dup-heavy clone corpus measures
    *    that worst case deliberately; this gate measures growth.)
    *  - embeddings: [[grownVectors]] manifold mixtures (novel points,
    *    same distribution).
    */
  def writeScaledWarehouse(spark: SparkSession, src: String, outDir: String,
      factor: Int, partitions: Int): Unit = {
    if (new java.io.File(outDir).exists()) return
    val tmp = outDir + ".tmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    def reps: DataFrame =
      spark.range(0, factor.toLong).select(col("id").as("rep"))
    def write(name: String, df: DataFrame): Unit =
      df.repartition(partitions)
        .write.mode("overwrite").parquet(s"$tmp/$name.parquet")
    def replicate(name: String, df: DataFrame,
        shifts: Seq[(String, Long)]): Unit = {
      // Shift bases must clear every existing id or replicas collide
      // and silently merge rows; one cheap min/max scan guards it.
      val maxes = df.agg(max(shifts.head._1),
        shifts.tail.map(s => max(s._1)): _*).collect().head
      shifts.zipWithIndex.foreach { case ((c, base), i) =>
        val m = maxes.getAs[Number](i).longValue
        require(m < base, s"$name.$c max id $m >= shift base $base: " +
          "replicas would collide")
      }
      val crossed = df.crossJoin(reps)
      val shifted = shifts.foldLeft(crossed) { case (d, (c, base)) =>
        d.withColumn(c, col(c) + col("rep") * base)
      }
      write(name, shifted.select(df.columns.map(col): _*))
    }
    def n(name: String): Long = Tables(spark, src, name).count()
    val (nCust, nOrd, nPart, nSupp) =
      (n("customer"), n("orders"), n("part"), n("supplier"))
    val (nEv, nUser) = {
      val e = Tables.events(spark, src)
      (e.count(),
        e.agg(max(col("user_id"))).collect().head.getLong(0) + 1L)
    }
    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))
    replicate("customer", Tables.customer(spark, src),
      Seq("c_custkey" -> nCust))
    replicate("supplier", Tables.supplier(spark, src),
      Seq("s_suppkey" -> nSupp))
    replicate("part", Tables.part(spark, src), Seq("p_partkey" -> nPart))
    replicate("orders", Tables.orders(spark, src),
      Seq("o_orderkey" -> nOrd, "o_custkey" -> nCust))
    replicate("lineitem", Tables.lineitem(spark, src),
      Seq("l_orderkey" -> nOrd, "l_partkey" -> nPart,
        "l_suppkey" -> nSupp))
    replicate("events", Tables.events(spark, src),
      Seq("event_id" -> nEv, "user_id" -> nUser))
    locally {
      val docs = Tables.documents(spark, src)
      val nDoc = docs.count()
      val mutated = docs.crossJoin(reps)
        .withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(
            regexp_replace(col("text"), lit("(\\S+)"),
              concat(lit("$1r"), col("rep")))))
        .withColumn("doc_id", col("doc_id") + col("rep") * nDoc)
        .withColumn("n_chars", length(col("text")).cast("long"))
      write("documents", mutated.select(docs.columns.map(col): _*))
    }
    write("embeddings", grownVectors(spark, src, factor))
    require(new java.io.File(tmp).renameTo(new java.io.File(outDir)),
      s"rename $tmp -> $outDir failed")
  }

  /** Derive a PLANTED-SKEW warehouse from an existing (scaled) one:
    *
    *  - a HUB CUSTOMER: one new order whose lineitems cover `supFrac`
    *    of all suppliers — so the purchase graph gains one customer
    *    node of degree supFrac·nSupp where the natural max is ~100.
    *    This is the C(deg,2) fan-out hazard `g4_jaccard`'s in-code
    *    comment flags by argument: all the hub's supplier pairs land on
    *    ONE self-join key.
    *  - a HOT PART: one extra lineitem (the same part, shipped inside
    *    g2's 1995 cohort) appended to `ordFrac` of orders — the
    *    high-degree node the degree-ordered triangle orientation exists
    *    to tame (edges orient INTO the max-degree node, so it generates
    *    no wedges).
    *
    * Every other table hardlinks to the source warehouse (read-only
    * reuse, no copy). The hub order's lineitems share one part, so the
    * hub customer does NOT also plant a part-graph clique — a single
    * order holding 30% of all parts would contain C(0.3·nPart, 3)
    * genuine triangles, which no plan can enumerate cheaply; the two
    * hazards are planted independently so each gate number isolates one
    * mechanism. [[HubGate]] measures the graph family on (scaled,
    * scaled+hub) and bounds the inflation.
    */
  def writeHubWarehouse(spark: SparkSession, scaled: String, outDir: String,
      supFrac: Double = 0.3, ordFrac: Double = 0.3): Unit = {
    import org.apache.spark.sql.types.DataType
    if (new java.io.File(outDir).exists()) return
    val tmp = outDir + ".tmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    Seq("region", "nation", "customer", "supplier", "part", "events",
      "documents", "embeddings").foreach { t =>
      linkTree(java.nio.file.Paths.get(scaled, s"$t.parquet"),
        java.nio.file.Paths.get(tmp, s"$t.parquet"))
    }
    val ord = spark.read.parquet(s"$scaled/orders.parquet")
    val li = spark.read.parquet(s"$scaled/lineitem.parquet")
    def oType(c: String): DataType = ord.schema(c).dataType
    def lType(c: String): DataType = li.schema(c).dataType
    val hubCust = ord.agg(min(col("o_custkey"))).collect()
      .head.getAs[Number](0).longValue
    val hubOrderKey = ord.agg(max(col("o_orderkey"))).collect()
      .head.getAs[Number](0).longValue + 1L
    val sup = spark.read.parquet(s"$scaled/supplier.parquet")
    val nSupp = sup.count()
    val hubSup = sup
      .select(col("s_suppkey").cast("long").as("s_suppkey"))
      .orderBy("s_suppkey").limit((nSupp * supFrac).toInt)
    // Templates: one real row supplies every column the fixture does
    // not care about, so the written schema matches the source bit for
    // bit however the driver generated it.
    val ordT = ord.orderBy("o_orderkey").limit(1)
    val liT = li.orderBy("l_orderkey", "l_linenumber").limit(1)
    val hubOrder = ordT.select(ord.columns.map {
      case "o_orderkey" => lit(hubOrderKey).cast(oType("o_orderkey"))
        .as("o_orderkey")
      case "o_custkey" => lit(hubCust).cast(oType("o_custkey"))
        .as("o_custkey")
      case c => col(c)
    }.toSeq: _*)
    val hubLi = liT.crossJoin(hubSup).select(li.columns.map {
      case "l_orderkey" => lit(hubOrderKey).cast(lType("l_orderkey"))
        .as("l_orderkey")
      case "l_suppkey" => col("s_suppkey").cast(lType("l_suppkey"))
        .as("l_suppkey")
      // s_suppkey doubles as a unique-within-order line number.
      case "l_linenumber" => col("s_suppkey")
        .cast(lType("l_linenumber")).as("l_linenumber")
      case c => col(c)
    }.toSeq: _*)
    val hotPartKey = spark.read.parquet(s"$scaled/part.parquet")
      .agg(min(col("p_partkey"))).collect().head.getAs[Number](0).longValue
    val targets = ord
      .filter(pmod(col("o_orderkey").cast("long"), lit(100)) <
        lit(math.round(ordFrac * 100)))
      .select(col("o_orderkey").cast("long").as("t_orderkey"))
    val hotLi = targets.crossJoin(broadcast(liT)).select(li.columns.map {
      case "l_orderkey" => col("t_orderkey").cast(lType("l_orderkey"))
        .as("l_orderkey")
      case "l_partkey" => lit(hotPartKey).cast(lType("l_partkey"))
        .as("l_partkey")
      case "l_linenumber" => lit(9999).cast(lType("l_linenumber"))
        .as("l_linenumber")
      case "l_shipdate" => lit("1995-06-15").cast(lType("l_shipdate"))
        .as("l_shipdate")
      case c => col(c)
    }.toSeq: _*)
    ord.unionByName(hubOrder).write.mode("overwrite")
      .parquet(s"$tmp/orders.parquet")
    li.unionByName(hubLi).unionByName(hotLi).write.mode("overwrite")
      .parquet(s"$tmp/lineitem.parquet")
    require(new java.io.File(tmp).renameTo(new java.io.File(outDir)),
      s"rename $tmp -> $outDir failed")
  }

  /** Derive a ZIPF-SKEWED variant of a warehouse: `o_custkey` is
    * remapped so customer popularity follows a Zipf law with exponent
    * `alpha` (default 1.2 — the "realistic web/commerce skew" regime),
    * while every other table hardlinks unchanged. The growth gates
    * clone-grow data whose key frequencies stay uniform-ish and
    * [[writeHubWarehouse]] plants one adversarial node; this variant
    * covers the gap between them — a whole heavy-tailed key
    * DISTRIBUTION, where a plan that is linear on uniform keys can
    * straggle on the popular ones. Sampling is deterministic
    * (xxhash64(o_orderkey) → inverse-CDF of the continuous Pareto tail:
    * rank = ⌈u^(−1/(α−1))⌉ clamped to the customer count, so
    * P(rank ≤ k) = 1 − k^−(α−1)); rank r maps to the r-th customer in
    * key order, so referential integrity to the customer table is
    * preserved exactly.
    */
  def writeZipfWarehouse(spark: SparkSession, src: String, outDir: String,
      alpha: Double = 1.2): Unit = {
    if (new java.io.File(outDir).exists()) return
    val tmp = outDir + ".tmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    Seq("region", "nation", "customer", "supplier", "part", "events",
      "documents", "embeddings", "lineitem").foreach { t =>
      linkTree(java.nio.file.Paths.get(src, s"$t.parquet"),
        java.nio.file.Paths.get(tmp, s"$t.parquet"))
    }
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val cust = spark.read.parquet(s"$src/customer.parquet")
    val nCust = cust.count()
    val ranked = cust.select(col("c_custkey"))
      .withColumn("zrank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("c_custkey")))
    val u = (pmod(xxhash64(col("o_orderkey")), lit(1000000007L))
      .cast("double") + 0.5) / 1000000007.0
    // Ranks past nCust are FOLDED back via modulo, not clamped: a
    // least(nCust, ...) clamp would dump the entire continuous-Pareto
    // tail mass P(rank > nCust) = nCust^−(α−1) (~15% of all orders at
    // sf0.1's ~15k customers, α=1.2) onto the single last-ranked
    // customer — an artifact atom BIGGER than rank 1, so gate readings
    // would partly measure the clamp, not the documented Zipf(α). The
    // tail is smooth over many wrap periods, so the fold spreads that
    // mass near-uniformly across all ranks: head keys keep their exact
    // Zipf dominance plus a thin uniform background. The double-space
    // pmod is safe — u ≥ 5e−10 bounds the raw rank below ~1e47, finite
    // in float64, and any precision loss only moves mass WITHIN the
    // folded tail, which is pseudo-random by construction anyway.
    val raw = ceil(pow(u, lit(-1.0 / (alpha - 1.0))))
    val rank = (pmod(raw - 1, lit(nCust.toDouble)) + 1).cast("int")
    val cType = ord.schema("o_custkey").dataType
    ord.withColumn("zrank", rank)
      .join(ranked, "zrank")
      .select(ord.columns.map {
        case "o_custkey" => col("c_custkey").cast(cType).as("o_custkey")
        case c => col(c)
      }.toSeq: _*)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    require(new java.io.File(tmp).renameTo(new java.io.File(outDir)),
      s"rename $tmp -> $outDir failed")
  }

  /** Minimal synthetic warehouse for [[HubGate]]'s EXTREME-hub probe:
    * only the two tables `g4_jaccard` reads (orders, lineitem), with
    *
    *  - ONE customer (key 1) whose single order covers supplier keys
    *    1..`degree` — degrees far beyond any real corpus (the probe
    *    runs 10⁶, where the planted-skew gate's warehouse hub is
    *    ~3000), and
    *  - 1000 background customers of degree ~30 each, so the query
    *    exercises its normal path alongside the hub.
    *
    * Schemas are cloned from one template row of the source warehouse
    * (same trick as [[writeHubWarehouse]]) so `Tables`' contracts hold
    * bit for bit. Each degree gets its own subdir (`deg<D>`): probes at
    * different degrees must not reuse a stale build.
    */
  def writeExtremeHubWarehouse(spark: SparkSession, src: String,
      outDir: String, degree: Long): Unit = {
    import org.apache.spark.sql.types.DataType
    if (new java.io.File(outDir).exists()) return
    val tmp = outDir + ".tmp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    def oType(c: String): DataType = ord.schema(c).dataType
    def lType(c: String): DataType = li.schema(c).dataType
    val ordT = ord.orderBy("o_orderkey").limit(1)
    val liT = li.orderBy("l_orderkey", "l_linenumber").limit(1)
    // Orders: customer k owns order k; customer 1 is the hub.
    val custs = spark.range(1, 1002).select(col("id").as("k"))
    val orders = ordT.crossJoin(custs).select(ord.columns.map {
      case "o_orderkey" => col("k").cast(oType("o_orderkey")).as("o_orderkey")
      case "o_custkey" => col("k").cast(oType("o_custkey")).as("o_custkey")
      case c => col(c)
    }.toSeq: _*)
    val hubLines = spark.range(1, degree + 1)
      .select(lit(1L).as("ok"), col("id").as("sk"))
    val bgLines = custs.filter(col("k") > 1)
      .select(col("k").as("ok"),
        explode(sequence(lit(0L), lit(29L))).as("i"))
      .select(col("ok"),
        (pmod(col("ok") * 7 + col("i"), lit(1000L)) + 1).as("sk"))
    val lineitem = hubLines.unionByName(bgLines)
      .crossJoin(broadcast(liT)).select(li.columns.map {
        case "l_orderkey" => col("ok").cast(lType("l_orderkey"))
          .as("l_orderkey")
        case "l_suppkey" => col("sk").cast(lType("l_suppkey"))
          .as("l_suppkey")
        // suppkey doubles as a unique-within-order line number.
        case "l_linenumber" => col("sk").cast(lType("l_linenumber"))
          .as("l_linenumber")
        case c => col(c)
      }.toSeq: _*)
    orders.write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    lineitem.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    require(new java.io.File(tmp).renameTo(new java.io.File(outDir)),
      s"rename $tmp -> $outDir failed")
  }

  /** Hardlink a parquet directory tree (fallback to copy when the
    * filesystem refuses links) — unchanged tables of a derived
    * warehouse share the source's bytes.
    */
  private def linkTree(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    // A raw-testdata table is ONE parquet file, not a directory (the
    // scaled warehouses write directories) — link it as a file, or the
    // walk below would materialize an empty dir Spark cannot read.
    if (Files.isRegularFile(src)) {
      Files.createDirectories(dst.getParent)
      if (!Files.exists(dst)) {
        try Files.createLink(dst, src)
        catch { case _: Exception => Files.copy(src, dst) }
      }
      return
    }
    Files.createDirectories(dst)
    Files.walk(src).forEach { p: Path =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else if (!Files.exists(target)) {
        try Files.createLink(target, p)
        catch { case _: Exception => Files.copy(p, target) }
      }
    }
  }
}
