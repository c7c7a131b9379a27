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
  /** One run-length pass over a sorted array; called from codegen. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n == 0) return new GenericArrayData(Array(0L, 0L, 0L))
    var maxRun = 1L
    var run = 1L
    var distinct = 1L
    var i = 1
    while (i < n) {
      if (a.getUTF8String(i).compareTo(a.getUTF8String(i - 1)) == 0) {
        run += 1
        if (run > maxRun) maxRun = run
      } else {
        distinct += 1
        run = 1
      }
      i += 1
    }
    new GenericArrayData(Array(maxRun, distinct, n.toLong))
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
  /** Pair, sort, run-length — all kernel-side; called from codegen. */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array(0L, 0L, 0L))
    val pairs = new Array[String](n - 1)
    var i = 0
    var prev = a.getUTF8String(0).toString
    while (i < n - 1) {
      val next = a.getUTF8String(i + 1).toString
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
    new GenericArrayData(Array(maxRun, distinct, (n - 1).toLong))
  }
}

object FreqFunctions {
  def sortedFreqStats(c: Column): Column =
    Glue.column(SortedFreqStats(Glue.expression(c)))
  def bigramFreqStats(c: Column): Column =
    Glue.column(BigramFreqStats(Glue.expression(c)))
}
