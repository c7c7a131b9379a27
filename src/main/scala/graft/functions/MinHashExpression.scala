package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftglue.Glue
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature vector over packed Kirsch-Mitzenmacher hash
  * pairs: input element v = (h1 << 31) | h2 with h1, h2 < P = 2^31-1;
  * output sig[i] = min over elements of (h1 + i*h2) mod P for i < k.
  *
  * Semantically identical to the composed form
  * `array_min(transform(hp, v -> ...))` per i (and to the DuckDB oracle),
  * but one primitive pass over the array computes all k signatures —
  * the 16 interpreted higher-order scans per row were the dominant cost
  * of the LSH pipeline at corpus scale (measured 125s → seconds at 50k
  * dup-heavy docs).
  */
case class MinHashSigs(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> of packed hashes, got ${t.simpleString}")
  }

  // Empty input → null, matching the composed form
  // array_min(transform(...)) and the DuckDB list_min oracle (which are
  // null on empty lists) rather than k sentinel Long.MaxValue entries.
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else MinHashSigs.compute(arr, numHashes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.MinHashSigs.compute($c, $numHashes);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  val P: Long = 2147483647L // 2^31 - 1

  /** All k signature minima in one pass; called from codegen. */
  def compute(packed: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = packed.numElements()
    var i = 0
    while (i < n) {
      val v = packed.getLong(i)
      val h1 = v >>> 31
      val h2 = v & P
      var j = 0
      var h = h1 % P
      while (j < k) {
        // h = (h1 + j*h2) mod P, maintained incrementally.
        if (h < mins(j)) mins(j) = h
        h += h2
        if (h >= P) h -= P
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

object MinHashFunctions {
  def minhashSigs(packed: Column, numHashes: Int): Column =
    Glue.column(MinHashSigs(Glue.expression(packed), numHashes))
}
