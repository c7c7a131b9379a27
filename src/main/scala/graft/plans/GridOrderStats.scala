package graft.plans

import graft.operators.Relational
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And,
  AttributeReference, AttributeSet, Cast, CreateArray, CreateStruct,
  EqualNullSafe, Expression, GetStructField, If, IsNull, KnownNotNull,
  Literal, NamedExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Percentile}
import org.apache.spark.sql.catalyst.plans.{Cross, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DoubleType, NumericType}

/** Optimizer rule: rewrites buffering order-statistic aggregates —
  * `median(v)`, `percentile(v, p)` (and `percentile_cont`, which the
  * analyzer lowers to `Percentile`) — into the distributed value-grid
  * plan, so the SQL everyone writes gets the plan that survives 100 TB.
  *
  * Spark's exact `Percentile` buffers EVERY input value of a group in
  * one reducer (an `OpenHashMap[value, count]` per group that is
  * unspillable within a group): a global median over a large table is a
  * single-task OOM by construction — `MemSmoke` demonstrates it dying
  * at 30M distinct doubles under a 2g heap while the grid form
  * survives. The rewrite produces the same dataflow the library's own
  * a13/w8/es_rfm queries use: collapse to the distinct value grid with
  * a map-side-combinable count, two-phase range-partitioned prefix sums
  * ([[Relational.rangeCumsum]]), then each percentile reads its two
  * bracketing order statistics out of the cumulative counts.
  *
  * Numerics are BIT-COMPATIBLE with the builtin: the final projection
  * mirrors `PercentileBase.getPercentile` exactly — position
  * `(n−1)·p`, `floor`/`ceil` bracketing ranks, the same short-circuits
  * (integral position → lower value; equal bracketing values → lower
  * value), and the identical IEEE expression
  * `(ceil−pos)·lo + (pos−floor)·hi` — verified per-bit against the
  * builtin in `GridRewriteSpec`.
  *
  * Scope (conservative by design — anything else keeps the builtin):
  *  - every `Percentile` in the `Aggregate` has a foldable scalar or
  *    array percentage, unit frequency, `reverse = false`, no DISTINCT
  *    and no FILTER, and is in `Complete` mode (the array form returns
  *    the builtin's `ArrayType(double, containsNull=false)`, NULL for
  *    empty groups);
  *  - percentile children may be DIFFERENT expressions (numeric each):
  *    the rewrite runs one grid per distinct value expression —
  *    `median(a), median(b), percentile(b, .9)` compiles grid(a) and
  *    grid(b), all fed from one pinned narrow projection of the child
  *    (one fact scan) and joined back on the grouping keys;
  *  - an output column may wrap its percentiles in scalar arithmetic
  *    (`round(median(x), 6)`, `p75 − p25`), and other output columns
  *    may carry ordinary non-Percentile aggregates (sum/count/avg…) —
  *    those run as a residual Aggregate over the same pinned child and
  *    join back on the grouping keys; mixing a Percentile and another
  *    aggregate inside ONE output expression bails;
  *  - grouping expressions are plain attributes (also allowed aliased
  *    in the output list);
  *  - the child is a batch (non-streaming) plan.
  *
  * The rewritten plan preserves the original output attribute ids, so
  * parent operators are untouched. Install via [[GraftExtensions]]
  * (`injectOptimizerRule`) or [[GridOrderStatsRule.install]] on a live
  * session (`experimental.extraOptimizations`, the same seam
  * [[AsOf.lastMatch]] uses for its strategy).
  */
object GridOrderStatsRule extends Rule[LogicalPlan] {

  /** Append to a live session's optimizer (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if eligible(agg) => rewrite(agg)
  }

  /** A rewritable Percentile call: the aggregate, its percentage list,
    * and whether it is the array form (`percentile(v, array(...))`).
    */
  private case class PHit(pc: Percentile, ps: Seq[Double],
    isArray: Boolean)

  private def pHitOf(ae: AggregateExpression): Option[PHit] = ae match {
    case AggregateExpression(pc: Percentile, Complete, false, None, _)
      if pc.frequencyExpression == Literal(1L) && !pc.reverse &&
        pc.percentageExpression.foldable &&
        pc.child.dataType.isInstanceOf[NumericType] &&
        pc.child.deterministic =>
      (pc.percentageExpression.dataType, pc.percentageExpression.eval()) match {
        case (DoubleType, p: java.lang.Double) =>
          Some(PHit(pc, Seq(p), isArray = false))
        case (ArrayType(DoubleType, _), arr: ArrayData)
          if arr.numElements() > 0 &&
            (0 until arr.numElements()).forall(!arr.isNullAt(_)) =>
          Some(PHit(pc, arr.toDoubleArray().toSeq, isArray = true))
        case _ => None
      }
    case _ => None
  }

  /** Classify one aliased output column.
    *  - Some(true): HIT leg — every AggregateExpression in the tree is
    *    a rewritable Percentile. Scalar arithmetic around or between
    *    them (`round(median(x), 6)`, `median(x) + 1`,
    *    `percentile(x,.75) − percentile(x,.25)`) is reconstructed over
    *    the grid columns in the final projection — v1 rewrote only
    *    direct aliases and sent exactly the SQL everyone writes
    *    (rounded medians) back to the buffering builtin.
    *  - Some(false): RESIDUAL leg — no Percentile anywhere in the tree
    *    (plain aggregates, incl. arithmetic like sum(x)/count(*)); it
    *    re-runs as an ordinary Aggregate and joins back on the keys.
    *  - None: bail — a non-rewritable Percentile, or a Percentile mixed
    *    with another aggregate in the SAME alias (the grid column and
    *    the residual column live on opposite sides of the join-back, so
    *    one scalar tree cannot reference both).
    */
  private def legOf(al: Alias): Option[Boolean] = {
    val aes = al.child.collect { case ae: AggregateExpression => ae }
    if (aes.isEmpty)
      if (al.child.exists(_.isInstanceOf[Percentile])) None else Some(false)
    else if (aes.forall(pHitOf(_).isDefined)) Some(true)
    else if (!al.child.exists(_.isInstanceOf[Percentile])) Some(false)
    else None
  }

  /** Every distinct rewritable Percentile call in output order (by
    * canonicalized form — `median(v)` written twice is one grid block).
    */
  private def distinctPHits(agg: Aggregate): Seq[(Expression, PHit)] =
    agg.aggregateExpressions
      .flatMap(_.collect { case ae: AggregateExpression => ae })
      .flatMap(ae => pHitOf(ae).map(ae.canonicalized -> _))
      .foldLeft(Vector.empty[(Expression, PHit)]) { case (acc, (c, h)) =>
        if (acc.exists(_._1 == c)) acc else acc :+ (c -> h)
      }

  private def eligible(agg: Aggregate): Boolean = {
    if (agg.child.isStreaming) return false
    if (!agg.groupingExpressions.forall(_.isInstanceOf[AttributeReference]))
      return false
    val keyIds = agg.groupingExpressions
      .map(_.asInstanceOf[AttributeReference].exprId).toSet
    if (distinctPHits(agg).isEmpty) return false
    // Every output column is a grouping attribute (possibly
    // re-aliased), a HIT leg, or a RESIDUAL leg — see [[legOf]].
    agg.aggregateExpressions.forall {
      case ar: AttributeReference => keyIds.contains(ar.exprId)
      case al: Alias => al.child match {
        case ar: AttributeReference => keyIds.contains(ar.exprId)
        case _ => legOf(al).isDefined
      }
      case _ => false
    }
  }

  private def rewrite(agg: Aggregate): LogicalPlan = {
    val spark = SparkSession.active
    val keys = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val keyIds = keys.map(_.exprId).toSet
    val keyNames = keys.indices.map(i => s"__gk$i")
    val hitList = distinctPHits(agg)
    // Residual legs: aliased aggregate expressions with no Percentile.
    // They re-run as an ordinary Aggregate over the same (pinned,
    // below) child and join back on the grouping keys; the residual
    // pass itself stays map-side-combinable.
    val residual = agg.aggregateExpressions.collect {
      case al: Alias if (al.child match {
        case _: AttributeReference => false // key re-alias
        case _ => legOf(al).contains(false)
      }) => al
    }
    // One grid per DISTINCT value expression (grouped by canonical
    // form): `median(a), median(b), percentile(b, .9)` runs grid(a)
    // and grid(b) — the plain-SQL form of exactMedians' multi-column
    // pass. v1 required every percentile to share one value column and
    // silently kept the buffering builtin for exactly the BI query
    // this exists for (several columns' medians in one GROUP BY).
    val groups: Seq[Seq[(Expression, PHit)]] =
      hitList.map(_._2.pc.child.canonicalized).distinct.map(ck =>
        hitList.filter(_._2.pc.child.canonicalized == ck))
    // ONE fact-table scan for the whole rewrite however many legs the
    // query carries: the child is projected to exactly the attributes
    // consumed (grouping keys, every percentile input, residual-leg
    // inputs) and, when more than one consumer exists (several grids
    // and/or a residual Aggregate — different partial aggregations no
    // exchange reuse can merge), that NARROW projection is pinned so
    // every consumer reads one cache entry. At 100× a second fact scan
    // is the difference between one pass and two. Entry lifetime is
    // bounded: the pin registry keys on the canonicalized plan
    // (re-compiling the same query replaces, never appends) and evicts
    // on context stop; the cached rows are the narrow projection,
    // spilling to disk past memory, which still beats a re-scan.
    val needed = AttributeSet(keys.toSeq) ++
      AttributeSet(hitList.flatMap(_._2.pc.child.references)) ++
      AttributeSet(residual.flatMap(_.references))
    val consumers = groups.size + (if (residual.isEmpty) 0 else 1)
    val sharedDf = Glue.ofRows(spark,
      Project(agg.child.output.filter(needed.contains), agg.child))
    val shared =
      (if (consumers > 1)
        graft.ContextCaches.pinBounded(sharedDf, "grid-rule-shared", 8)
      else sharedDf)
        .queryExecution.analyzed
    // Per-grid compile. Keys travel wrapped in single-field structs:
    // the grid's internal equi-joins (cum⋈tot, the prefix-sum offsets)
    // would silently drop NULL-keyed groups — a struct is never null
    // and struct comparison treats null fields as equal, making every
    // downstream join/groupBy null-safe without touching rangeCumsum.
    //
    // Each grid subtree must be OPTIMIZED, not merely analyzed: it
    // contains Deduplicate/ResolvedHint nodes that only early optimizer
    // batches rewrite, and when this rule runs from a late batch
    // (experimental.extraOptimizations) those batches won't visit the
    // new subtree again — the planner then fails on the leftovers. It
    // must also pass through a FRESH QueryExecution for cache
    // substitution (withCachedData runs BEFORE optimization on the
    // outer query, so a subtree spliced in by this rule would never be
    // matched against the pin). Reentrancy-safe (this rule no-ops on
    // the subtree, which contains no Percentile); output attribute ids
    // survive optimization.
    //
    // `exprs` maps each rewritable AggregateExpression (canonicalized)
    // to its output expression: the scalar __q column, or the builtin's
    // array shape — NULL for an empty group (never an array OF nulls; a
    // non-empty group's quantiles are provably non-null, so the first
    // element's nullness IS group-emptiness), elements KnownNotNull so
    // the type matches ArrayType(double, containsNull = false).
    case class Grid(resolved: LogicalPlan,
      byName: Map[String, org.apache.spark.sql.catalyst.expressions.Attribute],
      exprs: Map[Expression, Expression])
    def mkGrid(g: Seq[(Expression, PHit)], needAllKeys: Boolean): Grid = {
      val projList = keys.zip(keyNames).map { case (a, n) =>
        Alias(CreateStruct(Seq(a)), n)() } :+
        Alias(Cast(g.head._2.pc.child, DoubleType), "v")()
      val base = Glue.ofRows(spark, Project(projList.toSeq, shared))
      val ps = g.flatMap(_._2.ps)
      val res = gridPercentiles(base, keyNames, ps, needAllKeys)
      val resolved = res.queryExecution.optimizedPlan
      val byName = resolved.output.map(a => a.name -> a).toMap
      def hitExpr(h: PHit, off: Int): Expression =
        if (!h.isArray) byName(s"__q$off")
        else {
          val elems = h.ps.indices.map(j =>
            KnownNotNull(byName(s"__q${off + j}")))
          If(IsNull(byName(s"__q$off")),
            Literal(null, ArrayType(DoubleType, containsNull = false)),
            CreateArray(elems))
        }
      val offs = g.map(_._2.ps.length).scanLeft(0)(_ + _)
      Grid(resolved, byName,
        g.zip(offs).map { case ((c, h), o) => c -> hitExpr(h, o) }.toMap)
    }
    // With residual legs the residual Aggregate is the row-set spine
    // (one row per group, incl. all-NULL-value and NULL-keyed groups);
    // without them grid 0 carries the all-keys frame and later grids
    // left-join onto it (their row sets are subsets: a group missing
    // from grid i has an all-NULL value column there — exactly the
    // NULL quantiles the left join produces).
    val grids = groups.zipWithIndex.map { case (g, gi) =>
      mkGrid(g, needAllKeys = residual.isEmpty && gi == 0) }
    val hitExprOf: Map[Expression, Expression] =
      grids.flatMap(_.exprs).toMap
    // Rebuild a HIT leg's scalar tree over the grid columns: every
    // rewritable Percentile call becomes its grid expression (looked up
    // by canonicalized form, so repeated identical calls share one
    // block) and grouping-attribute references remap through `keyRef`.
    // transformDown: the replacement is emitted whole, so attributes
    // INSIDE a percentile's value expression are never touched.
    def rewriteHitTree(e: Expression, keyRef: Int => Expression): Expression =
      e.transformDown {
        case ae: AggregateExpression if hitExprOf.contains(ae.canonicalized) =>
          hitExprOf(ae.canonicalized)
        case ar: AttributeReference if keyIds.contains(ar.exprId) =>
          keyRef(keys.indexWhere(_.exprId == ar.exprId))
      }
    def keyOf(g: Grid, i: Int) = g.byName(keyNames(i))
    // Join-back shape: every non-spine frame has ONE ROW PER GROUP, so
    // at scale these are group-cardinality joins (AQE broadcasts small
    // sides at runtime; no compile-time hint — arbitrary user SQL may
    // group by a high-cardinality key, where a forced broadcast would
    // collect every group to the driver). Global form: all sides are
    // single-row frames, a 1×1 nested-loop join.
    // `spineKey` and `gridKey` must be the SAME representation: the
    // pure path compares struct key to struct key; the mixed path
    // compares the residual spine's raw key to the grid struct's
    // unwrapped field.
    def joinBack(spine: LogicalPlan, g: Grid, spineKey: Int => Expression,
        gridKey: Int => Expression): LogicalPlan =
      if (keys.isEmpty) Join(spine, g.resolved, Cross, None, JoinHint.NONE)
      else {
        val cond = keys.indices.map(i =>
          EqualNullSafe(spineKey(i), gridKey(i)))
          .reduceLeft[Expression](And(_, _))
        Join(spine, g.resolved, LeftOuter, Some(cond), JoinHint.NONE)
      }
    if (residual.isEmpty) {
      val spine = grids.head
      val joined = grids.tail.foldLeft(spine.resolved)((acc, g) =>
        joinBack(acc, g, i => keyOf(spine, i), i => keyOf(g, i)))
      def unwrapKey(i: Int): Expression =
        GetStructField(keyOf(spine, i), 0, None)
      val outs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case ar: AttributeReference =>
          val i = keys.indexWhere(_.exprId == ar.exprId)
          Alias(unwrapKey(i), ar.name)(exprId = ar.exprId)
        case al: Alias => al.child match {
          case ar: AttributeReference =>
            val i = keys.indexWhere(_.exprId == ar.exprId)
            Alias(unwrapKey(i), al.name)(exprId = al.exprId)
          case _ =>
            Alias(rewriteHitTree(al.child, unwrapKey), al.name)(
              exprId = al.exprId)
        }
        case other => // unreachable under eligible()
          throw new IllegalStateException(
            s"unexpected aggregate output $other")
      }
      Project(outs, joined)
    } else {
      // Mixed legs: the residual Aggregate (original Alias objects, so
      // downstream references resolve unchanged) provides one row per
      // group — exactly the builtin's row set — and each grid result
      // LEFT-joins onto it per grouping key, null-safely so NULL-keyed
      // groups match their grid rows. Built over `shared` through a
      // fresh QueryExecution (same cache-substitution argument as the
      // grids above).
      val keyAliases = keys.zipWithIndex.map { case (k, i) =>
        Alias(k, s"__rk$i")() }
      val residualAgg = Glue.ofRows(spark, Aggregate(agg.groupingExpressions,
        (keyAliases ++ residual).toSeq, shared)).queryExecution.optimizedPlan
      val joined = grids.foldLeft(residualAgg)((acc, g) =>
        joinBack(acc, g, i => keyAliases(i).toAttribute,
          i => GetStructField(keyOf(g, i), 0, None)))
      val outs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case ar: AttributeReference =>
          val i = keys.indexWhere(_.exprId == ar.exprId)
          Alias(keyAliases(i).toAttribute, ar.name)(exprId = ar.exprId)
        case al: Alias => al.child match {
          case ar: AttributeReference if keyIds.contains(ar.exprId) =>
            val i = keys.indexWhere(_.exprId == ar.exprId)
            Alias(keyAliases(i).toAttribute, al.name)(exprId = al.exprId)
          case _ if legOf(al).contains(true) =>
            Alias(
              rewriteHitTree(al.child, i => keyAliases(i).toAttribute),
              al.name)(exprId = al.exprId)
          case _ => al.toAttribute // residual leg, exprId preserved
        }
        case other => // unreachable under eligible()
          throw new IllegalStateException(
            s"unexpected aggregate output $other")
      }
      Project(outs, joined)
    }
  }

  /** The grid plan: distinct-value collapse → two-phase prefix sums →
    * bracketing order statistics → the builtin's interpolation, one
    * result column `__q<i>` per requested percentage.
    *
    * The collapse is PINNED (grid-sized: one row per distinct
    * (keys, v) cell, NULL-v cells kept so the all-keys frame reads the
    * same entry): unpinned, every cumsum consumer and the all-keys
    * frame re-ran the scan+collapse — the exact multi-scan disease the
    * library's gridQuantiles already fixed. The earlier `pin = false`
    * rationale (cache entries accumulating per distinct rewritten
    * query) is retired by the registry semantics: entries key on the
    * canonicalized plan (recompiling the same query replaces, never
    * appends), are grid-sized, and evict on context stop.
    *
    * No broadcast hints here, unlike the library helper: this rewrites
    * ARBITRARY user SQL, whose grouping key may be high-cardinality
    * (a per-group frame then must not collect to the driver). The
    * joins stay shuffled in the plan and AQE converts them to
    * broadcast at runtime when the group side is actually small.
    *
    * `pin = false` on the cumsum: the cumsum's consumers re-evaluate
    * only the cheap filter over the pinned collapse, so a second cache
    * entry would buy nothing.
    */
  private def gridPercentiles(base: DataFrame, keyNames: Seq[String],
      ps: Seq[Double], needAllKeys: Boolean): DataFrame = {
    val global = keyNames.isEmpty
    val keys = if (global) Seq("__gkc") else keyNames
    val withKeys = if (global) base.withColumn("__gkc", lit(0)) else base
    val gridAll = withKeys
      .groupBy((keys :+ "v").map(col): _*).agg(count(lit(1)).as("c"))
    val gridPin =
      graft.ContextCaches.pinBounded(gridAll, "grid-rule-grids", 32)
    val counts = gridPin.filter(col("v").isNotNull)
    val tot = counts.groupBy(keys.map(col): _*).agg(sum("c").as("n"))
    // Same runtime-adaptive plan choice as the library gridQuantiles
    // (r15): a bounded grid takes the plain one-window cumsum instead
    // of the 4-extra-exchange two-phase split. The decision aggregate
    // runs over the pinBounded collapse during the rewrite — a nested
    // job from the optimizer thread, same mechanism broadcast
    // exchanges use; the count query contains no percentile aggregate,
    // so the rule cannot recurse into itself.
    val cum = Relational.rangeCumsum(counts, keys, pin = false,
        buckets = if (Relational.maxCellsPerKey(counts, keys) <=
          Relational.CumsumSingleSortMaxCells) 1 else 32)
      .join(tot, keys)
    val qs = ps.zipWithIndex.flatMap { case (p, i) =>
      // 0-based fractional position (n−1)·p, exactly the builtin's
      // arithmetic; a grid row covers 1-based rank r iff
      // cum − c < r ≤ cum.
      val pos = (col("n") - 1).cast("double") * lit(p)
      val cover = (r: org.apache.spark.sql.Column) =>
        col("cum") - col("c") < r && col("cum") >= r
      Seq(
        min(when(cover(floor(pos) + 1), col("v"))).as(s"__lo$i"),
        min(when(cover(ceil(pos) + 1), col("v"))).as(s"__hi$i"),
        max(col("n")).as(s"__n$i"))
    }
    val res = cum.groupBy(keys.map(col): _*).agg(qs.head, qs.tail: _*)
    val out = ps.indices.map { i =>
      val pos = (col(s"__n$i") - 1).cast("double") * lit(ps(i))
      // Mirrors PercentileBase.getPercentile branch for branch:
      // integral position → lower; equal bracketing values → lower;
      // else (ceil−pos)·lo + (pos−floor)·hi.
      when(ceil(pos) === floor(pos), col(s"__lo$i"))
        .when(col(s"__lo$i") === col(s"__hi$i"), col(s"__lo$i"))
        .otherwise(
          (ceil(pos).cast("double") - pos) * col(s"__lo$i") +
            (pos - floor(pos).cast("double")) * col(s"__hi$i"))
        .as(s"__q$i")
    }
    val scored = res.select((keys.map(col) ++ out): _*)
    if (global) {
      // A global aggregate yields exactly one row even over zero input
      // rows (value NULL) — forced by the final global min over the
      // ≤1-row grouped result.
      scored.groupBy()
        .agg(min(col("__q0")).as("__q0"),
          ps.indices.drop(1).map(i => min(col(s"__q$i")).as(s"__q$i")): _*)
    } else if (!needAllKeys) {
      // A residual Aggregate upstream already carries the full group
      // list (incl. all-NULL-value groups); skipping the all-keys frame
      // here avoids a second pass over the child.
      scored
    } else {
      // Null-safe left join keeps all-NULL (and NULL-keyed) groups in
      // the output with NULL quantiles — the builtin's row set. Reads
      // the pinned collapse (which keeps NULL-v cells), not the child:
      // the group list comes for free off the same cache entry.
      val allKeys = gridPin.select(keys.map(col): _*).distinct()
      val cond = keys.map(k => allKeys(k) <=> scored(k)).reduce(_ && _)
      allKeys.join(scored, cond, "left")
        .select(keys.map(allKeys(_)) ++
          ps.indices.map(i => scored(s"__q$i")): _*)
    }
  }
}
