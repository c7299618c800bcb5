package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the ANN hot loop: the dot product of
  * two double arrays, with whole-stage codegen (a tight primitive
  * `for` over `ArrayData` — no lambda dispatch, no boxing). The
  * `zip_with + aggregate` formulation allocates an intermediate array
  * and walks it with interpreted higher-order lambdas; at 10^9 vectors
  * × 64 dims that difference is the scan cost.
  *
  * Summation is sequential left-to-right — bit-identical to the fold
  * formulation it replaces, so oracle parity is unaffected.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_dot expects array<double>, got " +
            s"${l.simpleString} / ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {

  /** Column API: dot product of two array<double> columns. */
  def vector_dot(a: Column, b: Column): Column =
    ColumnBridge.column(
      VectorDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Cosine similarity built on the native dot (same math/order as the
    * fold formulation in Similarity.cosine).
    */
  def vector_cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{lit, sqrt, when}
    // an all-zero vector (missing/padded embedding) has norm 0 — define
    // its similarity as 0 instead of letting ANSI mode throw on 0/0
    // (one bad row must not kill a corpus-wide ANN job)
    val denom = sqrt(vector_dot(a, a)) * sqrt(vector_dot(b, b))
    when(denom === 0.0, lit(0.0)).otherwise(vector_dot(a, b) / denom)
  }

  /** Register `vector_dot` for SQL use on an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", exprs => VectorDot(exprs(0), exprs(1)), "scala_udf")
}

/** SparkSessionExtensions hook:
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vector_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[VectorDot].getName, "vector_dot"),
        (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NfcNormalize].getName, "nfc_normalize"),
        (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
  }
}
