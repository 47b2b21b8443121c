package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector hot path (SURVEY.md §2.10
  * preference order: a codegen'd `Expression` beats a Scala UDF beats
  * interpreted higher-order functions).
  *
  * The built-in formulation `aggregate(zip_with(a, b, _*_), 0L, _+_)`
  * allocates an intermediate array and runs interpreted per row;
  * [[DotLongArrays]] compiles to a tight primitive loop inside
  * whole-stage codegen.
  */
object VectorExprs {

  /** Exact int64 dot product of two ArrayType(LongType) columns
    * (shorter length wins; null if either side is null). */
  case class DotLongArrays(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case _ =>
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "dot_long_arrays"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var s = 0L
      var i = 0
      while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $s = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column form of [[DotLongArrays]]. */
  def dotQ(a: Column, b: Column): Column =
    GraftBridge.column(DotLongArrays(GraftBridge.expression(a), GraftBridge.expression(b)))
}
