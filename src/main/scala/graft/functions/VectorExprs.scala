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

  import java.util.Arrays.{equals => aEq, hashCode => aHash, deepEquals, deepHashCode}
  private def refs(a: Array[Array[Long]]): Array[AnyRef] = a.asInstanceOf[Array[AnyRef]]

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

  /** Product-quantization encoder: all `m` per-subspace argmins in ONE
    * compiled pass over the row's quantized vector. `books` is the
    * flattened codebook — row `s*k + j` holds subspace `s`'s entry `j`
    * (each `sub` longs), embedded as a reference object so the generated
    * code runs tight primitive loops over it. Output: array of 2m longs —
    * positions [0, m) hold the chosen code POSITION per subspace (argmin
    * of exact squared L2, ties to the lower position), positions [m, 2m)
    * the corresponding exact d².
    *
    * Why not `aggregate` folds over literal matrices: higher-order
    * functions run interpreted per element — measured ~1.2 ms/row for
    * the m=8, k=16 shape (PLANS.md round-7 ADC note), which is the whole
    * per-row budget at corpus scale. This expression is the same
    * arithmetic inside whole-stage codegen. */
  case class PqCodesLongArray(child: Expression, books: Array[Array[Long]],
                              m: Int, sub: Int)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

    private val k = books.length / m

    // array params compare by reference in the synthesized case-class
    // equals, which defeats canonicalization / CSE (round-7 ADVICE) —
    // compare model-state CONTENTS
    override def equals(o: Any): Boolean = o match {
      case that: PqCodesLongArray =>
        child == that.child && m == that.m && sub == that.sub &&
          deepEquals(refs(books), refs(that.books))
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(child, Int.box(m), Int.box(sub), Int.box(deepHashCode(refs(books))))

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<bigint>, got $t")
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "pq_codes_long_array"

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val out = new Array[Long](2 * m)
      var s = 0
      while (s < m) {
        var bestJ = 0L
        var bestD = Long.MaxValue
        var j = 0
        while (j < k) {
          val cv = books(s * k + j)
          var d = 0L
          var i = 0
          val base = s * sub
          val len = math.max(0, math.min(sub, a.numElements() - base))
          while (i < len) {
            val t = a.getLong(base + i) - cv(i)
            d += t * t
            i += 1
          }
          if (d < bestD) { bestD = d; bestJ = j }
          j += 1
        }
        out(s) = bestJ
        out(m + s) = bestD
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val b = ctx.addReferenceObj("pqBooks", books, "long[][]")
        val out = ctx.freshName("out")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val t = ctx.freshName("t")
        val cv = ctx.freshName("cv")
        val base = ctx.freshName("base")
        val len = ctx.freshName("len")
        val bestJ = ctx.freshName("bestJ")
        val bestD = ctx.freshName("bestD")
        s"""
           |long[] $out = new long[${2 * m}];
           |for (int $s = 0; $s < $m; $s++) {
           |  long $bestJ = 0L; long $bestD = Long.MAX_VALUE;
           |  int $base = $s * $sub;
           |  int $len = java.lang.Math.max(0, java.lang.Math.min($sub, $v.numElements() - $base));
           |  for (int $j = 0; $j < $k; $j++) {
           |    long[] $cv = $b[$s * $k + $j];
           |    long $d = 0L;
           |    for (int $i = 0; $i < $len; $i++) {
           |      long $t = $v.getLong($base + $i) - $cv[$i];
           |      $d += $t * $t;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
           |  }
           |  $out[$s] = $bestJ;
           |  $out[$m + $s] = $bestD;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[PqCodesLongArray]]: `posBooks` indexed by subspace,
    * each entry (position, sub-vector, sub-norm²) in position order. */
  def pqCodes(vec: Column, posBooks: IndexedSeq[Seq[(Long, Seq[Long], Long)]],
              m: Int, sub: Int): Column = {
    val flat = posBooks.flatMap(_.map(_._2.toArray)).toArray
    GraftBridge.column(PqCodesLongArray(GraftBridge.expression(vec), flat, m, sub))
  }

  /** Nearest-cell assignment: argmax of exact-quantized cosine against a
    * reference-object centroid matrix in one compiled pass — the same
    * (cos DESC, cid ASC) order as the window/fold formulations (strict >
    * over cid-ascending entries keeps the lowest cid on ties). Inputs
    * must have nonzero norms (no NaN cosines — callers enforce the
    * semDedup zero-norm rule). */
  case class NearestCellLongArrays(left: Expression, right: Expression,
                                   cids: Array[Long], cvs: Array[Array[Long]],
                                   cns: Array[Long])
      extends BinaryExpression {

    override def equals(o: Any): Boolean = o match {
      case that: NearestCellLongArrays =>
        left == that.left && right == that.right && aEq(cids, that.cids) &&
          deepEquals(refs(cvs), refs(that.cvs)) && aEq(cns, that.cns)
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(left, right, Int.box(aHash(cids)),
        Int.box(deepHashCode(refs(cvs))), Int.box(aHash(cns)))

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint), got ($l, $r)")
      }
    override def dataType: DataType = LongType
    override def prettyName: String = "nearest_cell_long_arrays"

    override def nullSafeEval(v: Any, n: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val qs = math.sqrt(n.asInstanceOf[Long].toDouble)
      var best = 0.0
      var bc = 0L
      var first = true
      var j = 0
      while (j < cids.length) {
        val cv = cvs(j)
        val len = math.min(a.numElements(), cv.length)
        var d = 0L
        var i = 0
        while (i < len) { d += a.getLong(i) * cv(i); i += 1 }
        val cos = d.toDouble / (qs * math.sqrt(cns(j).toDouble))
        if (first || cos > best) { best = cos; bc = cids(j); first = false }
        j += 1
      }
      bc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, n) => {
        val cidsRef = ctx.addReferenceObj("cellIds", cids, "long[]")
        val cvsRef = ctx.addReferenceObj("cellVecs", cvs, "long[][]")
        val cnsRef = ctx.addReferenceObj("cellNorms", cns, "long[]")
        val qs = ctx.freshName("qs")
        val best = ctx.freshName("best")
        val bc = ctx.freshName("bc")
        val first = ctx.freshName("first")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val cv = ctx.freshName("cv")
        val len = ctx.freshName("len")
        val cos = ctx.freshName("cos")
        s"""
           |double $qs = java.lang.Math.sqrt((double) $n);
           |double $best = 0.0d; long $bc = 0L; boolean $first = true;
           |for (int $j = 0; $j < $cidsRef.length; $j++) {
           |  long[] $cv = $cvsRef[$j];
           |  int $len = java.lang.Math.min($v.numElements(), $cv.length);
           |  long $d = 0L;
           |  for (int $i = 0; $i < $len; $i++) { $d += $v.getLong($i) * $cv[$i]; }
           |  double $cos = ((double) $d) / ($qs * java.lang.Math.sqrt((double) $cnsRef[$j]));
           |  if ($first || $cos > $best) { $best = $cos; $bc = $cidsRef[$j]; $first = false; }
           |}
           |${ev.value} = $bc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column form of [[NearestCellLongArrays]]: `cents` as (cid, vector,
    * norm²). The expression's tie-break (strict > over a cid-ascending
    * scan keeps the LOWER cid) requires sorted entries — sorted here, so
    * an unsorted caller gets correct ties instead of silently wrong ones
    * (round-7 ADVICE). */
  def nearestCell(vec: Column, norm2: Column,
                  cents: Seq[(Long, Seq[Long], Long)]): Column = {
    val s = cents.sortBy(_._1)
    GraftBridge.column(NearestCellLongArrays(
      GraftBridge.expression(vec), GraftBridge.expression(norm2),
      s.map(_._1).toArray, s.map(_._2.toArray).toArray, s.map(_._3).toArray))
  }

  /** Top-`p` cell probe: the `p` nearest centroid ids by exact-quantized
    * cosine, ordered (cos DESC, cid ASC) — [[NearestCellLongArrays]]'
    * multiprobe generalization (IVF nprobe > 1). One compiled
    * insertion-select pass; output length min(p, #centroids). */
  case class NearestCellsLongArrays(left: Expression, right: Expression,
                                    cids: Array[Long], cvs: Array[Array[Long]],
                                    cns: Array[Long], p: Int)
      extends BinaryExpression {

    private val outLen = math.min(p, cids.length)

    override def equals(o: Any): Boolean = o match {
      case that: NearestCellsLongArrays =>
        left == that.left && right == that.right && p == that.p && aEq(cids, that.cids) &&
          deepEquals(refs(cvs), refs(that.cvs)) && aEq(cns, that.cns)
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(left, right, Int.box(p), Int.box(aHash(cids)),
        Int.box(deepHashCode(refs(cvs))), Int.box(aHash(cns)))

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint), got ($l, $r)")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "nearest_cells_long_arrays"

    override def nullSafeEval(v: Any, n: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val qs = math.sqrt(n.asInstanceOf[Long].toDouble)
      val bestCos = Array.fill(outLen)(Double.NegativeInfinity)
      val bestCid = new Array[Long](outLen)
      var j = 0
      while (j < cids.length) {
        val cv = cvs(j)
        val len = math.min(a.numElements(), cv.length)
        var d = 0L
        var i = 0
        while (i < len) { d += a.getLong(i) * cv(i); i += 1 }
        val cos = d.toDouble / (qs * math.sqrt(cns(j).toDouble))
        // strict > over cid-ascending entries: ties keep the lower cid
        var pos = outLen
        while (pos > 0 && cos > bestCos(pos - 1)) pos -= 1
        if (pos < outLen) {
          var t = outLen - 1
          while (t > pos) { bestCos(t) = bestCos(t - 1); bestCid(t) = bestCid(t - 1); t -= 1 }
          bestCos(pos) = cos; bestCid(pos) = cids(j)
        }
        j += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(bestCid)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, n) => {
        val cidsRef = ctx.addReferenceObj("cellIds", cids, "long[]")
        val cvsRef = ctx.addReferenceObj("cellVecs", cvs, "long[][]")
        val cnsRef = ctx.addReferenceObj("cellNorms", cns, "long[]")
        val qs = ctx.freshName("qs")
        val bc = ctx.freshName("bestCos")
        val bi = ctx.freshName("bestCid")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val cv = ctx.freshName("cv")
        val len = ctx.freshName("len")
        val cos = ctx.freshName("cos")
        val pos = ctx.freshName("pos")
        val t = ctx.freshName("t")
        s"""
           |double $qs = java.lang.Math.sqrt((double) $n);
           |double[] $bc = new double[$outLen];
           |long[] $bi = new long[$outLen];
           |java.util.Arrays.fill($bc, Double.NEGATIVE_INFINITY);
           |for (int $j = 0; $j < $cidsRef.length; $j++) {
           |  long[] $cv = $cvsRef[$j];
           |  int $len = java.lang.Math.min($v.numElements(), $cv.length);
           |  long $d = 0L;
           |  for (int $i = 0; $i < $len; $i++) { $d += $v.getLong($i) * $cv[$i]; }
           |  double $cos = ((double) $d) / ($qs * java.lang.Math.sqrt((double) $cnsRef[$j]));
           |  int $pos = $outLen;
           |  while ($pos > 0 && $cos > $bc[$pos - 1]) $pos--;
           |  if ($pos < $outLen) {
           |    for (int $t = $outLen - 1; $t > $pos; $t--) { $bc[$t] = $bc[$t - 1]; $bi[$t] = $bi[$t - 1]; }
           |    $bc[$pos] = $cos; $bi[$pos] = $cidsRef[$j];
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bi);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column form of [[NearestCellsLongArrays]] — sorts `cents` by cid for
    * the same tie-break reason as [[nearestCell]]. */
  def nearestCells(vec: Column, norm2: Column,
                   cents: Seq[(Long, Seq[Long], Long)], p: Int): Column = {
    val s = cents.sortBy(_._1)
    GraftBridge.column(NearestCellsLongArrays(
      GraftBridge.expression(vec), GraftBridge.expression(norm2),
      s.map(_._1).toArray, s.map(_._2.toArray).toArray, s.map(_._3).toArray, p))
  }

  /** [[PqCodesLongArray]] over the RESIDUAL `vec - centroid(cell)` — the
    * FAISS IVF-PQ layout: codes quantize what the coarse cell did not
    * explain. `cell` selects the centroid via binary search over the
    * cid-sorted reference arrays; a cell id not in the table fails
    * loudly (it would silently encode the raw vector otherwise). */
  case class PqResidualCodesLongArray(left: Expression, right: Expression,
                                      books: Array[Array[Long]], m: Int, sub: Int,
                                      centIds: Array[Long], centVecs: Array[Array[Long]])
      extends BinaryExpression {

    private val k = books.length / m

    override def equals(o: Any): Boolean = o match {
      case that: PqResidualCodesLongArray =>
        left == that.left && right == that.right && m == that.m && sub == that.sub &&
          deepEquals(refs(books), refs(that.books)) && aEq(centIds, that.centIds) &&
          deepEquals(refs(centVecs), refs(that.centVecs))
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(left, right, Int.box(m), Int.box(sub),
        Int.box(deepHashCode(refs(books))), Int.box(aHash(centIds)),
        Int.box(deepHashCode(refs(centVecs))))

    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, bigint), got ($l, $r)")
      }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "pq_residual_codes_long_array"

    override def nullSafeEval(v: Any, cellAny: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val ci = java.util.Arrays.binarySearch(centIds, cellAny.asInstanceOf[Long])
      require(ci >= 0, s"$prettyName: cell ${cellAny} not in the centroid table")
      val cent = centVecs(ci)
      val out = new Array[Long](2 * m)
      var s = 0
      while (s < m) {
        var bestJ = 0L
        var bestD = Long.MaxValue
        val base = s * sub
        val len = math.max(0, math.min(sub, math.min(a.numElements(), cent.length) - base))
        var j = 0
        while (j < k) {
          val cv = books(s * k + j)
          var d = 0L
          var i = 0
          while (i < len) {
            val t = a.getLong(base + i) - cent(base + i) - cv(i)
            d += t * t
            i += 1
          }
          if (d < bestD) { bestD = d; bestJ = j }
          j += 1
        }
        out(s) = bestJ
        out(m + s) = bestD
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, cell) => {
        val b = ctx.addReferenceObj("pqBooks", books, "long[][]")
        val idsRef = ctx.addReferenceObj("centIds", centIds, "long[]")
        val vecsRef = ctx.addReferenceObj("centVecs", centVecs, "long[][]")
        val ci = ctx.freshName("ci")
        val cent = ctx.freshName("cent")
        val out = ctx.freshName("out")
        val s = ctx.freshName("s")
        val j = ctx.freshName("j")
        val i = ctx.freshName("i")
        val d = ctx.freshName("d")
        val t = ctx.freshName("t")
        val cv = ctx.freshName("cv")
        val base = ctx.freshName("base")
        val len = ctx.freshName("len")
        val bestJ = ctx.freshName("bestJ")
        val bestD = ctx.freshName("bestD")
        s"""
           |int $ci = java.util.Arrays.binarySearch($idsRef, $cell);
           |if ($ci < 0) throw new IllegalArgumentException(
           |  "pq_residual_codes_long_array: cell " + $cell + " not in the centroid table");
           |long[] $cent = $vecsRef[$ci];
           |long[] $out = new long[${2 * m}];
           |for (int $s = 0; $s < $m; $s++) {
           |  long $bestJ = 0L; long $bestD = Long.MAX_VALUE;
           |  int $base = $s * $sub;
           |  int $len = java.lang.Math.max(0, java.lang.Math.min($sub,
           |    java.lang.Math.min($v.numElements(), $cent.length) - $base));
           |  for (int $j = 0; $j < $k; $j++) {
           |    long[] $cv = $b[$s * $k + $j];
           |    long $d = 0L;
           |    for (int $i = 0; $i < $len; $i++) {
           |      long $t = $v.getLong($base + $i) - $cent[$base + $i] - $cv[$i];
           |      $d += $t * $t;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
           |  }
           |  $out[$s] = $bestJ;
           |  $out[$m + $s] = $bestD;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Column form of [[PqResidualCodesLongArray]]: `posBooks` as in
    * [[pqCodes]]. `cents` sorted by cid here — the expression's binary
    * search requires ascending ids (round-7 ADVICE). */
  def pqResidualCodes(vec: Column, cell: Column,
                      posBooks: IndexedSeq[Seq[(Long, Seq[Long], Long)]],
                      m: Int, sub: Int,
                      cents: Seq[(Long, Seq[Long], Long)]): Column = {
    val flat = posBooks.flatMap(_.map(_._2.toArray)).toArray
    val s = cents.sortBy(_._1)
    GraftBridge.column(PqResidualCodesLongArray(
      GraftBridge.expression(vec), GraftBridge.expression(cell),
      flat, m, sub, s.map(_._1).toArray, s.map(_._2.toArray).toArray))
  }
}
