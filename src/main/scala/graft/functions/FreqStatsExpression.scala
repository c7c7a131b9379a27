package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Frequency statistics of a SORTED string array in one linear pass:
  * returns [max run length, distinct count, total count] — the
  * sufficient statistics for repetition ratios (top-element fraction,
  * distinct/total). The composed form (explode → groupBy element →
  * re-group per row) shuffles every n-gram twice; on a sorted array the
  * same numbers are one run-length walk per row, no shuffle at all.
  * Input MUST be sorted (callers apply array_sort); equal elements are
  * then adjacent, which is all the walk relies on.
  */
case class SortedFreqStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sorted_freq_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SortedFreqStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortedFreqStats.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SortedFreqStats = copy(child = newChild)
}

object SortedFreqStats {
  /** One run-length pass over a sorted array; called from codegen.
    * Null elements are skipped (they count toward none of the three
    * statistics): the expression is SQL-registered, so a caller can
    * hand it array('a', NULL) and must get an answer, not an NPE.
    * array_sort groups equal non-null elements adjacently regardless
    * of where it places nulls, which is all the walk relies on.
    */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var maxRun = 0L
    var run = 0L
    var distinct = 0L
    var total = 0L
    var prev: org.apache.spark.unsafe.types.UTF8String = null
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val cur = a.getUTF8String(i)
        total += 1
        if (prev != null && cur.compareTo(prev) == 0) run += 1
        else { distinct += 1; run = 1 }
        if (run > maxRun) maxRun = run
        prev = cur
      }
      i += 1
    }
    new GenericArrayData(Array(maxRun, distinct, total))
  }
}

/** Same statistics over the ADJACENT PAIRS (word bigrams) of an
  * UNSORTED token array, pairing and sorting inside the kernel: a
  * `transform(sequence(...), i -> concat_ws(...))` formulation runs an
  * interpreted, boxing lambda per element (measured ~5s at sf0.1 for
  * what this kernel does in milliseconds); here the pairs never
  * materialize as Catalyst values at all.
  */
case class BigramFreqStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bigram_freq_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BigramFreqStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramFreqStats.compute($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BigramFreqStats = copy(child = newChild)
}

object BigramFreqStats {
  /** Pair, sort, run-length — all kernel-side; called from codegen.
    * Null tokens are dropped before pairing (SQL callers can pass
    * arrays with nulls; a null token is no token, not an NPE).
    */
  def compute(a: ArrayData): ArrayData = {
    val n0 = a.numElements()
    val toks = new Array[String](n0)
    var m = 0
    var j = 0
    while (j < n0) {
      if (!a.isNullAt(j)) { toks(m) = a.getUTF8String(j).toString; m += 1 }
      j += 1
    }
    if (m < 2) return new GenericArrayData(Array(0L, 0L, 0L))
    val pairs = new Array[String](m - 1)
    var i = 0
    var prev = toks(0)
    while (i < m - 1) {
      val next = toks(i + 1)
      pairs(i) = prev + " " + next
      prev = next
      i += 1
    }
    java.util.Arrays.sort(pairs.asInstanceOf[Array[AnyRef]])
    var maxRun = 1L
    var run = 1L
    var distinct = 1L
    i = 1
    while (i < pairs.length) {
      if (pairs(i) == pairs(i - 1)) {
        run += 1
        if (run > maxRun) maxRun = run
      } else {
        distinct += 1
        run = 1
      }
      i += 1
    }
    new GenericArrayData(Array(maxRun, distinct, (m - 1).toLong))
  }
}

object FreqFunctions {
  def sortedFreqStats(c: Column): Column =
    Glue.column(SortedFreqStats(Glue.expression(c)))
  def bigramFreqStats(c: Column): Column =
    Glue.column(BigramFreqStats(Glue.expression(c)))
}
