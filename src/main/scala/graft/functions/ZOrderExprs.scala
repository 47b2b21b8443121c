package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bit interleaving for Z-order (Morton-curve) clustering — the layout
  * primitive behind [[graft.sources.Layout]]: rows sorted by the
  * interleaved value place multi-dimensionally-near rows near each other
  * in file order, which tightens EVERY clustered column's per-file
  * min/max envelope and lets parquet footer stats skip files/row-groups
  * for filters on ANY clustered dimension (a lexicographic sort only
  * serves its leading column).
  *
  * The interleave is a pure bit shuffle over pre-normalized cell
  * coordinates; per the §2.10 preference order it's a native codegen'd
  * expression, not a UDF — the hot path is one pass over every row of a
  * table being rewritten.
  */
object ZOrderExprs {

  /** Interleaves the low `bits` bits of `n` non-negative longs (packed as
    * one `array<bigint>` child — `CreateArray` is natively codegen'd, so
    * the whole pipeline stays inside whole-stage codegen) into a single
    * long, MSB-first and round-robin across fields: output bit
    * `bits*n - 1 - (j*n + i)` is bit `bits - 1 - j` of field `i`. Fields
    * beyond `n` or values ≥ 2^bits are a caller bug — the normalizer
    * clamps — and the high bits are simply ignored by the masked reads.
    * Null array or null element → null (callers coalesce first). */
  case class ZInterleave(child: Expression, bits: Int, n: Int) extends UnaryExpression {

    require(n >= 1 && bits >= 1 && bits * n <= 63,
      s"z-interleave needs 1..63 total bits, got $n fields x $bits bits")

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $t")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "z_interleave"
    // always nullable: the short-array/null-element guards assign
    // ev.isNull in codegen, which needs a real local even when the
    // packed child itself is non-nullable
    override def nullable: Boolean = true

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() < n) return null
      var i = 0
      while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
      var z = 0L
      var j = bits - 1
      while (j >= 0) {
        var f = 0
        while (f < n) {
          z = (z << 1) | ((a.getLong(f) >>> j) & 1L)
          f += 1
        }
        j -= 1
      }
      z
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val z = ctx.freshName("z")
        val j = ctx.freshName("j")
        val f = ctx.freshName("f")
        val bad = ctx.freshName("bad")
        s"""
           |boolean $bad = $v.numElements() < $n;
           |for (int $f = 0; !$bad && $f < $n; $f++) { $bad = $v.isNullAt($f); }
           |if ($bad) {
           |  ${ev.isNull} = true;
           |} else {
           |  long $z = 0L;
           |  for (int $j = $bits - 1; $j >= 0; $j--) {
           |    for (int $f = 0; $f < $n; $f++) {
           |      $z = ($z << 1) | (($v.getLong($f) >>> $j) & 1L);
           |    }
           |  }
           |  ${ev.value} = $z;
           |}
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form: `fields` packed via `array(...)` by the caller. */
  def zInterleave(packed: Column, bits: Int, n: Int): Column =
    GraftBridge.column(ZInterleave(GraftBridge.expression(packed), bits, n))

  /** Rank cell of a double against SORTED quantile bounds: the number of
    * bounds ≤ the value (binary search over a reference-object array in
    * codegen) — [[graft.sources.Layout]]'s QUANTILE scaling, which gives
    * a skewed column equi-POPULATED cells where linear min/max scaling
    * collapses most rows into a few. Output ∈ [0, bounds.length]; null
    * in → null out. Tie placement is arbitrary-but-deterministic
    * (binarySearch), fine for layout: cells affect cost, never results. */
  case class BucketIndex(child: Expression, bounds: Array[Double])
      extends UnaryExpression {

    require(bounds.nonEmpty, "BucketIndex needs at least one bound")

    // array params compare by reference in the synthesized equals, which
    // defeats canonicalization / CSE — compare contents (the
    // PqCodesLongArray precedent)
    override def equals(o: Any): Boolean = o match {
      case that: BucketIndex =>
        child == that.child && java.util.Arrays.equals(bounds, that.bounds)
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(child, Int.box(java.util.Arrays.hashCode(bounds)))

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case org.apache.spark.sql.types.DoubleType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires double, got $t")
    }
    override def dataType: DataType = LongType
    override def prettyName: String = "bucket_index"

    override def nullSafeEval(v: Any): Any = {
      val r = java.util.Arrays.binarySearch(bounds, v.asInstanceOf[Double])
      (if (r >= 0) r + 1 else -(r + 1)).toLong
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val b = ctx.addReferenceObj("bucketBounds", bounds, "double[]")
        val r = ctx.freshName("r")
        s"""
           |int $r = java.util.Arrays.binarySearch($b, $v);
           |${ev.value} = ($r >= 0) ? ($r + 1L) : (-($r + 1L));
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[BucketIndex]]. */
  def bucketIndex(v: Column, bounds: Array[Double]): Column =
    GraftBridge.column(BucketIndex(GraftBridge.expression(v), bounds))
}
