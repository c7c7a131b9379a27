package graft.operators

import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Round-2 inventory extensions beyond the reference surface: temporal
  * joins (as-of, range), pivot, distinct aggregates, correlation
  * statistics, array functions, the rank-function family and corpus
  * bigram statistics. All oracle-checked against DuckDB.
  *
  * Scale notes per operator are on each method — none of these is
  * all-pairs, and the joins are either broadcast (bounded dimension) or
  * one partition-friendly shuffle.
  */
object Extended {

  /** As-of join: each event picks the most recent `error` event of the
    * same user at-or-before its timestamp (the classic trades/quotes
    * shape; here: "time since last error" enrichment).
    *
    * Spark-first plan: NOT a join at all — the right stream is unioned
    * into the left with a tag, one (user_id)-partitioned window computes
    * `last(err_us, ignoreNulls)` over rows ≤ current. One shuffle total,
    * no pair blow-up, state per key bounded by the window frame — at
    * 100 TB this is the merge-based as-of every stream processor uses,
    * with ties resolved right-row-first so the match is inclusive,
    * exactly like DuckDB's ASOF (e.ts >= r.ts) semantics.
    */
  /** The merge-based as-of plan over any (event_id, user_id, tus,
    * event_type) frame — shared by the oracle query and ScaleSmoke so
    * the measured plan IS the shipped plan.
    */
  private[graft] def asofLastError(ev: DataFrame): DataFrame = {
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("tus"), lit(0).as("tag"),
        lit(null).cast("long").as("eid"), col("tus").as("err_us"))
    val lefts = ev
      .select(col("user_id"), col("tus"), lit(1).as("tag"),
        col("event_id").as("eid"), lit(null).cast("long").as("err_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus"), col("tag"), col("eid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    errs.unionByName(lefts)
      .withColumn("last_err_us", last(col("err_us"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("eid").as("event_id"), col("user_id"), col("tus"),
        col("last_err_us"))
  }

  private def j5AsofJoin(s: SparkSession, d: String): DataFrame =
    asofLastError(Tables.events(s, d)
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("tus"),
        col("event_type")))
      .orderBy("event_id")

  /** The same as-of semantics through the custom whole-operator path
    * ([[graft.plans.AsOfJoinPlan]] + strategy + merge exec) instead of
    * the composed union-window plan — both are oracle-checked against
    * DuckDB's ASOF LEFT JOIN, and a spec asserts they agree bit-for-bit.
    */
  private def j7AsofCustom(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), tsUs(col("ts")).as("tus"))
    val errs = Tables.events(s, d)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), tsUs(col("ts")).as("err_tus"))
    graft.plans.AsOf.lastMatch(ev, errs,
      "user_id", "tus", "err_user", "err_tus", "last_err_us")
      .orderBy("event_id")
  }

  /** Range join: events binned into value intervals from a (tiny) ranges
    * dimension. The dimension is broadcast, so the theta-join is a
    * broadcast nested loop over 4 rows per event — no shuffle of the fact
    * side, which is the only plan that survives 100 TB (a shuffle theta
    * join would be all-pairs).
    */
  private val ValueRanges: Seq[(Int, Double, Double)] = Seq(
    (0, 0.0, 50.0), (1, 50.0, 100.0), (2, 100.0, 200.0), (3, 200.0, 1e9))

  private def j6RangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ranges = ValueRanges.toDF("bucket_id", "lo", "hi")
    Tables.events(s, d)
      .join(broadcast(ranges),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("bucket_id")
      .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_value"))
      .orderBy("bucket_id")
  }

  /** Pivot: per-user average value by event type, one column per type.
    * The type list is explicit (never inferred with an extra collect
    * job); the plan is a single partial+final hash aggregate over
    * user_id — pivot columns are just conditional aggregates.
    */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  private def p13Pivot(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(r6(avg(col("value"))))
      .orderBy("user_id")

  /** Distinct aggregates: grouped count-distinct and sum-distinct.
    * Catalyst plans these as a two-phase expand+aggregate; the distinct
    * sum accumulates in DECIMAL so both engines agree bit-exactly.
    */
  private def a17DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("d_parts"),
        sum_distinct(col("l_quantity").cast(DecimalType(38, 6)))
          .cast("double").as("sd_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Correlation statistics: Pearson corr and covariances per group —
    * single-pass co-moment aggregates (partial+final), the textbook
    * map-side-combine shape.
    */
  private def a18Corr(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        r6(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
        r6(covar_pop(col("l_quantity"), col("l_extendedprice"))).as("cov_p"),
        r6(covar_samp(col("l_quantity"), col("l_extendedprice"))).as("cov_s"))
      .orderBy("l_returnflag")

  /** Array-function surface over the embedding column: size, indexing,
    * min/max, slice + aggregate — all codegen'd, one narrow pass.
    */
  private def f5Array(s: SparkSession, d: String): DataFrame = {
    val e = col("embedding").cast("array<double>")
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(e).as("dim"),
      r6(element_at(e, 1)).as("first"),
      r6(array_max(e)).as("mx"),
      r6(array_min(e)).as("mn"),
      r6(aggregate(slice(e, 1, 8), lit(0.0), _ + _)).as("head_sum"))
      .orderBy("vec_id")
  }

  /** Rank-function family: percent_rank, cume_dist, ntile quartiles over
    * a per-user total order (value with event_id tiebreak — ties must be
    * broken identically in both engines for determinism).
    */
  private def w9RankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_id"),
        r6(percent_rank().over(w)).as("pr"),
        r6(cume_dist().over(w)).as("cd"),
        ntile(4).over(w).as("quartile"))
      .orderBy("event_id")
  }

  /** Corpus bigram document frequency, top-20: per-doc distinct word
    * bigrams explode into a combiner-friendly count (map-side partials on
    * the shuffle), then TakeOrdered — the n-gram statistics pass of a
    * training-data pipeline.
    */
  private def taBigrams(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(Dedup.shingles(col("text"), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("bigram")).limit(20)

  /** Regex function surface: global replace, group extraction, match
    * predicate — all codegen'd; patterns kept in the RE2-compatible
    * subset so Java and DuckDB regex engines agree.
    */
  private def f6Regex(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      substring(regexp_replace(col("text"), "[0-9]+", "#"), 1, 40).as("masked"),
      regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
      col("text").rlike("data").cast("int").as("has_data"))
      .orderBy("doc_id")

  /** Boolean aggregates: per-group every/any — partial+final, one bit of
    * state per group per predicate.
    */
  private def a19BoolAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type")
      .agg(
        bool_and(col("value") > 0).as("all_pos"),
        bool_or(col("value") > 400).as("any_big"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** Deterministic list/string aggregation: the per-key set of event
    * types, sorted then joined — the canonical way to make a collect
    * aggregate order-stable across engines and partitionings.
    */
  private def a21StringAgg(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(concat_ws(",", array_sort(collect_set(col("event_type"))))
        .as("types"))
      .orderBy("user_id")

  /** first_value / last_value / nth_value window family over the
    * per-user event order (unique (ts, event_id) key, so ROWS and RANGE
    * frames agree in both engines).
    */
  private def w10FirstLast(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsUs(col("ts")), col("event_id"))
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, d)
      .select(col("event_id"),
        r6(first(col("value")).over(w)).as("first_v"),
        r6(last(col("value")).over(wAll)).as("last_v"),
        r6(nth_value(col("value"), 2).over(w)).as("second_v"))
      .orderBy("event_id")
  }


  /** W13: the distribution-window family (ntile, percent_rank,
    * cume_dist) — completes the rank family of w9 with the quantile-
    * bucket/empirical-CDF shapes used for per-group score calibration.
    */
  private def w13Distribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value"), col("event_id"))
    Tables.events(s, d).select(
      col("event_id"),
      ntile(4).over(w).as("quartile"),
      r6(percent_rank().over(w)).as("pct_rank"),
      r6(cume_dist().over(w)).as("cdf"))
      .orderBy("event_id")
  }

  /** Map-typed column surface: per-user event_type → mean-value map
    * built with map_from_entries over a collected struct list, then
    * consumed with element_at / map_keys. The map stays internal to the
    * Spark plan; the output is plain columns, so the oracle recomputes
    * the same values with conditional aggregation — map construction is
    * checked against semantics ground truth rather than an
    * engine-specific map rendering.
    */
  private def f12Map(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(r6(avg(col("value"))).as("v"))
      .groupBy("user_id")
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("event_type"), col("v"))))).as("m"))
      .select(col("user_id"),
        size(map_keys(col("m"))).as("n_types"),
        // try_element_at: under ANSI mode (Spark 4 default) element_at
        // THROWS on a missing map key; a user with no 'click' events
        // must yield null here, as the oracle's conditional aggregate does.
        try_element_at(col("m"), lit("click")).as("click_avg"),
        try_element_at(col("m"), lit("error")).as("error_avg"))
      .orderBy("user_id")
  }

  /** Per-group top-k through the custom typed Aggregator
    * ([[graft.functions.TopKAggregator]]): only k-row buffers shuffle
    * (map-side partial heaps), unlike the window row_number form that
    * sorts and shuffles every row — oracle-checked against exactly that
    * window form in DuckDB.
    */
  private def a24TopkAgg(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ds = Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .as[(String, Double, Long)]
    ds.groupByKey(_._1)
      .mapValues(v => graft.functions.ScoredId(v._2, v._3))
      .agg(new graft.functions.TopKAggregator(3).toColumn)
      .flatMap { case (et, top) =>
        top.zipWithIndex.map { case (r, i) => (et, i + 1, r.id, r.score) }
      }
      .toDF("event_type", "rnk", "event_id", "value")
      .select(col("event_type"), col("rnk"), col("event_id"),
        r6(col("value")).as("value"))
      .orderBy("event_type", "rnk")
  }

  /** Rolling distinct count over a BOUNDED frame: Spark has no
    * count(DISTINCT) window, so the idiom is a set aggregate over the
    * frame — size(array_distinct(collect_list(...))) — which is
    * scale-safe exactly because the ROWS frame bounds the collected
    * state to 5 elements per row (never do this over an unbounded
    * frame).
    */
  private def w14RollingDistinct(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(tsUs(col("ts")), col("event_id")).rowsBetween(-4, 0)
    Tables.events(s, d).select(
      col("event_id"),
      size(array_distinct(collect_list(col("event_type")).over(w)))
        .as("d_types_5"))
      .orderBy("event_id")
  }

  /** Rolling median over a bounded 5-row frame — the robust smoother
    * (outlier-resistant, unlike the rolling mean w1/w2 family). Frame
    * state is 5 values per row; never do this over an unbounded frame.
    */
  private def w16RollingMedian(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(tsUs(col("ts")), col("event_id")).rowsBetween(-4, 0)
    // median() rejects window frames, so take the frame's values
    // (bounded: 5 per row) and interpolate the middle explicitly —
    // even-count frames average the two middles, matching SQL median.
    // collect_list drops nulls, so an all-null frame gives n=0: guard
    // it to NULL (element_at(_, 0) would throw; SQL median is NULL).
    val arr = sort_array(collect_list(col("value")).over(w))
    val n = size(arr)
    val med = when(n === 0, lit(null).cast("double"))
      .when(n % 2 === 1, element_at(arr, ((n + 1) / 2).cast("int")))
      .otherwise((element_at(arr, (n / 2).cast("int")) +
        element_at(arr, (n / 2 + 1).cast("int"))) / 2.0)
    Tables.events(s, d).select(
      col("event_id"), r6(med).as("med5"))
      .orderBy("event_id")
  }

  /** Gap-fill with forward interpolation — the time-series
    * regularization every metrics/feature pipeline runs before
    * windowed modeling: a (user × day) grid from the global date spine,
    * daily aggregates left-joined on, and missing days forward-filled
    * with the last observed value (`last(ignoreNulls)` over a growing
    * frame — O(1) state per row). The spine is a generated axis
    * (min/max scalar job + sequence), the grid a broadcast cross join
    * of a bounded dimension; the only data shuffle is the daily
    * aggregation and the grid join on (user, day). Leading days before
    * a user's first event stay null on both engines.
    */
  private def w15GapFill(s: SparkSession, d: String): DataFrame =
    gapFill(Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value")))
      .orderBy("user_id", "day")

  /** The gap-fill plan over an (user_id, day, value) frame — shared by
    * the query and the 100× scale smoke.
    */
  private[graft] def gapFill(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy("user_id", "day").agg(r6(avg("value")).as("v"))
    val spine = ev.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(sequence(col("d0"), col("d1"),
        expr("interval 1 day"))).as("day"))
    val grid = ev.select("user_id").distinct().crossJoin(broadcast(spine))
    val w = Window.partitionBy("user_id").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("was_gap", col("v").isNull.cast("int"))
      .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
      .select("user_id", "day", "v_filled", "was_gap")
  }

  /** Binary encode/decode surface: base64 and hex round-trips over the
    * utf-8 payload — the wire formats multimodal binary columns cross
    * system boundaries in. Round-trip equality is asserted IN the query
    * (rt_ok) so the oracle checks both directions.
    */
  private def f13Encode(s: SparkSession, d: String): DataFrame = {
    val payload = encode(col("text"), "UTF-8")
    // This build chunks base64 past 57 bytes (76-char MIME lines with
    // CRLF): spark.sql.chunkBase64String.enabled is true here
    // (empirically verified — 100 bytes encode to 138 chars, not 136);
    // DuckDB never chunks. Strip the line breaks so lengths and any
    // slice past the first line agree — unbase64 accepts both forms,
    // so this is correct whichever way the conf is set.
    val b64 = translate(base64(payload), "\r\n", "")
    Tables.documents(s, d).select(
      col("doc_id"),
      substring(b64, 1, 24).as("b64_prefix"),
      substring(hex(payload), 1, 24).as("hex_prefix"),
      (length(b64) % 4).cast("long").as("b64_pad_mod"),
      (decode(unbase64(b64), "UTF-8") === col("text") &&
        decode(unhex(hex(payload)), "UTF-8") === col("text"))
        .cast("int").as("rt_ok"))
      .orderBy("doc_id")
  }


  /** First-class FULL OUTER JOIN: daily error/purchase reconciliation
    * per user. At the (user_id, day) grain the testdata genuinely
    * exercises all three match states (sf0.01: 1026 error-only days,
    * 1018 purchase-only, 586 both), so the null-extension on BOTH sides
    * is load-bearing, not decorative. The join keys pass as a Seq so
    * Spark emits the coalesced USING-style key columns; the two sides
    * are independently filtered aggregates (two scans of the fact
    * table — no subplan sharing applies), and the join itself shuffles
    * only the already-aggregated day grain.
    */
  private def j8FullOuter(s: SparkSession, d: String): DataFrame = {
    def side(t: String, cnt: String) = Tables.events(s, d)
      .filter(col("event_type") === t)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as(cnt))
    side("error", "n_err")
      .join(side("purchase", "n_pur"), Seq("user_id", "day"), "full_outer")
      .select(col("user_id"), col("day"),
        coalesce(col("n_err"), lit(0L)).as("n_err"),
        coalesce(col("n_pur"), lit(0L)).as("n_pur"))
      .withColumn("status",
        when(col("n_err") > 0 && col("n_pur") > 0, "both")
          .when(col("n_err") > 0, "error_only").otherwise("purchase_only"))
      .orderBy("user_id", "day")
  }

  /** Value-RANGE window frame: per-user trailing band [v-10, v] over the
    * value order — frames defined by the ORDER key's values, not row
    * counts (the other half of the SQL window-frame spec; W1/W2 cover
    * ROWS frames).
    */
  private def w11RangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("value"))
      .rangeBetween(-10L, 0L)
    Tables.events(s, d)
      .select(col("event_id"),
        count(lit(1)).over(w).as("n_in_band"),
        sum(col("value").cast(DecimalType(38, 6))).over(w)
          .cast("double").as("band_sum"))
      .orderBy("event_id")
  }

  /** arg-min/arg-max aggregates: first/last event type per user. The
    * selector key is a zero-padded (epoch-µs, event_id) string — unique
    * and identically ordered in both engines, making the arg aggregates
    * tie-free (DuckDB's arg_max has no composite-key overload).
    */
  private def a22ArgMinmax(s: SparkSession, d: String): DataFrame = {
    val key = concat(
      lpad(tsUs(col("ts")).cast("string"), 20, "0"), lit("-"),
      lpad(col("event_id").cast("string"), 10, "0"))
    Tables.events(s, d)
      .groupBy("user_id")
      .agg(min_by(col("event_type"), key).as("first_type"),
        max_by(col("event_type"), key).as("last_type"),
        count(lit(1)).as("n"))
      .orderBy("user_id")
  }

  /** Bitwise scalar surface: and/or/xor/shifts/bit_count — the hash and
    * signature pipelines use these internally; declared here as a
    * first-class oracle-checked family.
    */
  private def f9Bitwise(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      col("event_id").bitwiseAND(lit(0xFFL)).as("b_and"),
      col("event_id").bitwiseOR(lit(0x100L)).as("b_or"),
      col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
      shiftleft(col("event_id"), 3).as("shl"),
      shiftrightunsigned(col("event_id"), 2).as("shr"),
      bit_count(col("event_id")).as("popcnt"))
      .orderBy("event_id")

  /** Extended string surface: pad/translate/repeat/reverse/replace —
    * the remainder of the scalar string family beyond f1.
    */
  private def f10String(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      lpad(col("p_brand"), 12, ".").as("brand_pad"),
      translate(col("p_type"), "aeiou", "AEIOU").as("type_vowels"),
      reverse(col("p_brand")).as("brand_rev"),
      regexp_replace(col("p_name"), " ", "_").as("name_snake"),
      length(col("p_name")).as("name_len"))
      .orderBy("p_partkey")

  /** Datetime extraction surface: calendar fields + truncation. The
    * dayofweek convention differs between engines (Spark 1=Sunday,
    * DuckDB 0=Sunday) — the oracle maps explicitly rather than trusting
    * same-named functions to agree.
    */
  private def f7Datetime(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      year(col("ts")).as("y"),
      quarter(col("ts")).as("q"),
      month(col("ts")).as("m"),
      dayofmonth(col("ts")).as("dom"),
      hour(col("ts")).as("h"),
      dayofweek(col("ts")).as("dow1"), // 1 = Sunday
      weekofyear(col("ts")).as("iso_week"),
      tsUs(date_trunc("day", col("ts"))).as("day_us"))
      .orderBy("event_id")

  /** Offset pagination: ORDER BY + OFFSET + LIMIT (the dashboard's
    * page-2 query). At scale offset pagination degrades (the sort must
    * still produce the skipped prefix) — keyset pagination (WHERE key >
    * last_seen, as in o2) is the 100 TB form; this covers the operator.
    */
  private def o4Offset(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .orderBy("s_suppkey")
      .offset(10).limit(20)

  /** Fixed-width histogram (the dashboard binning shape): floor-divide
    * into bins, count per bin — one combiner-friendly aggregate.
    */
  private def a23Histogram(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(floor(col("value") / 25).cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), r6(avg(col("value"))).as("avg_in_bin"))
      .orderBy("bin")

  /** Null-semantics surface: nullif/coalesce/null-safe equality — the
    * three-valued-logic cases that diverge between engines if handled
    * casually (Spark `<=>` ≡ SQL IS NOT DISTINCT FROM).
    */
  private def p14NullSemantics(s: SparkSession, d: String): DataFrame = {
    val dsc = nullif(col("l_discount"), lit(0.0))
    val tax = nullif(col("l_tax"), lit(0.0))
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      r6(coalesce(dsc, lit(-1.0))).as("disc_or_neg1"),
      (dsc <=> tax).cast("int").as("disc_eq_tax_nullsafe"),
      dsc.isNull.cast("int").as("disc_is_null"))
      .orderBy("l_orderkey", "l_linenumber")
  }


  /** Inverse-frequency class weights (total / (k·n) per label) — the
    * standard imbalance correction, computed as one tiny agg + broadcast
    * of the per-class stats.
    */
  private def mlClassWeights(s: SparkSession, d: String): DataFrame = {
    val c = Tables.embeddings(s, d)
      .groupBy("label").agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).cast("double").as("total"),
      count(lit(1)).as("k"))
    c.crossJoin(broadcast(t))
      .select(col("label"), col("n"),
        r6(col("total") / (col("k") * col("n"))).as("weight"))
      .orderBy("label")
  }

  /** Text normalization: lowercase, strip non-alphanumerics, collapse
    * whitespace — emitted as the normalized hash + length (the form a
    * normalization-then-dedup pass keys on).
    */
  private def taNormalize(s: SparkSession, d: String): DataFrame = {
    val norm = TextAnalysis.normText(col("text"))
    Tables.documents(s, d)
      .select(col("doc_id"), md5(norm).as("norm_hash"),
        length(norm).as("n_norm"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, Query] = Map(
    "f6_regex" -> f6Regex _,
    "a19_bool_agg" -> a19BoolAgg _,
    "a21_string_agg" -> a21StringAgg _,
    "w10_first_last" -> w10FirstLast _,
    "a22_arg_minmax" -> a22ArgMinmax _,
    "a23_histogram" -> a23Histogram _,
    "p14_null_semantics" -> p14NullSemantics _,
    "f7_datetime" -> f7Datetime _,
    "f9_bitwise" -> f9Bitwise _,
    "f10_string" -> f10String _,
    "o4_offset" -> o4Offset _,
    "ml_class_weights" -> mlClassWeights _,
    "ta_normalize" -> taNormalize _,
    "w13_distribution" -> w13Distribution _,
    "w14_rolling_distinct" -> w14RollingDistinct _,
    "w15_gap_fill" -> w15GapFill _,
    "w16_rolling_median" -> w16RollingMedian _,
    "f12_map" -> f12Map _,
    "f13_encode" -> f13Encode _,
    "a24_topk_agg" -> a24TopkAgg _,
    "w11_range_frame" -> w11RangeFrame _,
    "j5_asof_join" -> j5AsofJoin _,
    "j7_asof_custom" -> j7AsofCustom _,
    "j6_range_join" -> j6RangeJoin _,
    "j8_full_outer" -> j8FullOuter _,
    "p13_pivot" -> p13Pivot _,
    "a17_distinct_agg" -> a17DistinctAgg _,
    "a18_corr" -> a18Corr _,
    "f5_array" -> f5Array _,
    "w9_rank_family" -> w9RankFamily _,
    "ta_bigrams" -> taBigrams _)

  val oracle: Map[String, String] = Map(
    // DuckDB regexp_replace needs the 'g' flag to match Java's
    // replace-all semantics.
    "f6_regex" ->
      """SELECT doc_id,
        |  substr(regexp_replace(text, '[0-9]+', '#', 'g'), 1, 40) AS masked,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  CAST(regexp_matches(text, 'data') AS INT) AS has_data
        |FROM documents ORDER BY doc_id""".stripMargin,
    "f9_bitwise" ->
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 256 AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  event_id << 3 AS shl,
        |  event_id >> 2 AS shr,
        |  CAST(bit_count(event_id) AS INT) AS popcnt
        |FROM events ORDER BY event_id""".stripMargin,
    "f10_string" ->
      """SELECT p_partkey,
        |  lpad(p_brand, 12, '.') AS brand_pad,
        |  translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
        |  reverse(p_brand) AS brand_rev,
        |  replace(p_name, ' ', '_') AS name_snake,
        |  CAST(len(p_name) AS INT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "f7_datetime" ->
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS y,
        |  CAST(quarter(ts) AS INT) AS q,
        |  CAST(month(ts) AS INT) AS m,
        |  CAST(day(ts) AS INT) AS dom,
        |  CAST(hour(ts) AS INT) AS h,
        |  CAST(dayofweek(ts) + 1 AS INT) AS dow1,
        |  CAST(weekofyear(ts) AS INT) AS iso_week,
        |  epoch_us(date_trunc('day', ts)) AS day_us
        |FROM events ORDER BY event_id""".stripMargin,
    "o4_offset" ->
      """SELECT * FROM supplier ORDER BY s_suppkey
        |LIMIT 20 OFFSET 10""".stripMargin,
    "a23_histogram" ->
      """SELECT CAST(floor(value / 25) AS BIGINT) AS bin, count(*) AS n,
        |  round(avg(value), 6) AS avg_in_bin
        |FROM events GROUP BY bin ORDER BY bin""".stripMargin,
    "p14_null_semantics" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(coalesce(nullif(l_discount, 0.0), -1.0), 6) AS disc_or_neg1,
        |  CAST(nullif(l_discount, 0.0) IS NOT DISTINCT FROM
        |    nullif(l_tax, 0.0) AS INT) AS disc_eq_tax_nullsafe,
        |  CAST(nullif(l_discount, 0.0) IS NULL AS INT) AS disc_is_null
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "a22_arg_minmax" ->
      """WITH k AS (SELECT user_id, event_type,
        |  lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '-' ||
        |    lpad(CAST(event_id AS VARCHAR), 10, '0') AS key
        |FROM events)
        |SELECT user_id, arg_min(event_type, key) AS first_type,
        |  arg_max(event_type, key) AS last_type, count(*) AS n
        |FROM k GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w16_rolling_median" ->
      """SELECT event_id,
        |  round(median(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
        |FROM events ORDER BY event_id""".stripMargin,
    "w15_gap_fill" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, value
        |  FROM events),
        |daily AS (SELECT user_id, day, round(avg(value), 6) AS v
        |  FROM ev GROUP BY user_id, day),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |spine AS (SELECT CAST(unnest(generate_series(d0, d1,
        |  INTERVAL 1 DAY)) AS DATE) AS day FROM mm),
        |grid AS (SELECT user_id, day
        |  FROM (SELECT DISTINCT user_id FROM ev), spine)
        |SELECT g.user_id, g.day,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS v_filled,
        |  CAST(v IS NULL AS INT) AS was_gap
        |FROM grid g LEFT JOIN daily USING (user_id, day)
        |ORDER BY user_id, day""".stripMargin,
    "ml_class_weights" ->
      """WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total, count(*) AS k FROM c)
        |SELECT label, n, round(total / (k * n), 6) AS weight
        |FROM c, t ORDER BY label""".stripMargin,
    "ta_normalize" ->
      s"""SELECT doc_id,
         |  md5(${TextAnalysis.normTextSql("text")}) AS norm_hash,
         |  CAST(len(${TextAnalysis.normTextSql("text")}) AS INT) AS n_norm
         |FROM documents ORDER BY doc_id""".stripMargin,
    "w14_rolling_distinct" ->
      """SELECT event_id,
        |  CAST(len(list_distinct(list(event_type) OVER w)) AS INT)
        |    AS d_types_5
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(ts), event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "f13_encode" ->
      """SELECT doc_id,
        |  substr(base64(encode(text)), 1, 24) AS b64_prefix,
        |  substr(hex(encode(text)), 1, 24) AS hex_prefix,
        |  CAST(len(base64(encode(text))) % 4 AS BIGINT) AS b64_pad_mod,
        |  CAST(decode(from_base64(base64(encode(text)))) = text
        |    AND decode(unhex(hex(encode(text)))) = text AS INT) AS rt_ok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "a24_topk_agg" ->
      """WITH ranked AS (SELECT event_type, event_id, value,
        |  CAST(row_number() OVER (PARTITION BY event_type
        |    ORDER BY value DESC, event_id) AS INT) AS rnk FROM events)
        |SELECT event_type, rnk, event_id, round(value, 6) AS value
        |FROM ranked WHERE rnk <= 3
        |ORDER BY event_type, rnk""".stripMargin,
    "f12_map" ->
      """WITH pa AS (SELECT user_id, event_type,
        |  round(avg(value), 6) AS v FROM events GROUP BY user_id, event_type)
        |SELECT user_id,
        |  CAST(count(*) AS INT) AS n_types,
        |  max(CASE WHEN event_type = 'click' THEN v END) AS click_avg,
        |  max(CASE WHEN event_type = 'error' THEN v END) AS error_avg
        |FROM pa GROUP BY user_id ORDER BY user_id""".stripMargin,
    "j8_full_outer" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    count(*) AS n_err FROM events
        |    WHERE event_type = 'error' GROUP BY 1, 2),
        |  p AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    count(*) AS n_pur FROM events
        |    WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT coalesce(e.user_id, p.user_id) AS user_id,
        |  coalesce(e.day, p.day) AS day,
        |  coalesce(n_err, 0) AS n_err,
        |  coalesce(n_pur, 0) AS n_pur,
        |  CASE WHEN coalesce(n_err, 0) > 0 AND coalesce(n_pur, 0) > 0
        |         THEN 'both'
        |       WHEN coalesce(n_err, 0) > 0 THEN 'error_only'
        |       ELSE 'purchase_only' END AS status
        |FROM e FULL OUTER JOIN p
        |  ON e.user_id = p.user_id AND e.day = p.day
        |ORDER BY user_id, day""".stripMargin,
    "w13_distribution" ->
      """SELECT event_id,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdf
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,
    "w11_range_frame" ->
      """SELECT event_id,
        |  count(*) OVER w AS n_in_band,
        |  CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE)
        |    AS band_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value
        |  RANGE BETWEEN 10 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "a19_bool_agg" ->
      """SELECT event_type, bool_and(value > 0) AS all_pos,
        |  bool_or(value > 400) AS any_big, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "a21_string_agg" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), ',')
        |    AS types
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "w10_first_last" ->
      """SELECT event_id,
        |  round(first_value(value) OVER w, 6) AS first_v,
        |  round(last_value(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND UNBOUNDED FOLLOWING), 6) AS last_v,
        |  round(nth_value(value, 2) OVER w, 6) AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |ORDER BY event_id""".stripMargin,
    // ASOF at epoch-µs resolution on BOTH sides: the raw column is
    // TIMESTAMP(NANOS), which Spark truncates to µs on read — comparing
    // at ns in DuckDB could order a sub-µs-later error before an event.
    "j5_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
        |r AS (SELECT user_id, epoch_us(ts) AS err_us FROM events
        |      WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, e.tus, r.err_us AS last_err_us
        |FROM e ASOF LEFT JOIN r
        |  ON e.user_id = r.user_id AND e.tus >= r.err_us
        |ORDER BY event_id""".stripMargin,
    "j7_asof_custom" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
        |r AS (SELECT user_id, epoch_us(ts) AS err_us FROM events
        |      WHERE event_type = 'error')
        |SELECT e.event_id, e.user_id, e.tus, r.err_us AS last_err_us
        |FROM e ASOF LEFT JOIN r
        |  ON e.user_id = r.user_id AND e.tus >= r.err_us
        |ORDER BY event_id""".stripMargin,
    "j6_range_join" -> {
      val vals = ValueRanges.map { case (b, lo, hi) => s"($b, $lo, $hi)" }
        .mkString(", ")
      s"""SELECT bucket_id, count(*) AS n, round(avg(value), 6) AS avg_value
         |FROM events JOIN (VALUES $vals) ranges(bucket_id, lo, hi)
         |  ON value >= lo AND value < hi
         |GROUP BY bucket_id ORDER BY bucket_id""".stripMargin
    },
    "p13_pivot" -> {
      val cols = EventTypes.map(t =>
        s"round(avg(value) FILTER (event_type = '$t'), 6) AS \"$t\"")
        .mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },
    "a17_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS d_parts,
        |  CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
        |    AS sd_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "a18_corr" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_pop(l_quantity, l_extendedprice), 6) AS cov_p,
        |  round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_s
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "f5_array" ->
      """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
        |           FROM embeddings)
        |SELECT vec_id, CAST(len(e) AS INT) AS dim,
        |  round(e[1], 6) AS first,
        |  round(list_max(e), 6) AS mx,
        |  round(list_min(e), 6) AS mn,
        |  round(list_sum(e[1:8]), 6) AS head_sum
        |FROM v ORDER BY vec_id""".stripMargin,
    "w9_rank_family" ->
      """SELECT event_id,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin,
    "ta_bigrams" -> {
      val sh2 = {
        val parts = (0 until 2).map(j => s"w[i+$j]").mkString(" || ' ' || ")
        s"""list_distinct(CASE WHEN len(w) >= 2
           | THEN list_transform(range(1, len(w)), i -> $parts)
           | ELSE [] END)""".stripMargin.replace("\n", "")
      }
      s"""WITH w0 AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |t AS (SELECT doc_id, $sh2 AS sh FROM w0),
         |e AS (SELECT unnest(sh) AS bigram FROM t)
         |SELECT bigram, count(*) AS df FROM e
         |GROUP BY bigram ORDER BY df DESC, bigram LIMIT 20""".stripMargin
    })
}
