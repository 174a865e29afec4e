package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen kernels for the INTEGER-GRID vector math that puts the ANN
  * stack (e2/e5/e8/e10/e11/e14, `queries/VectorOps.scala`) under the DuckDB
  * hash gate: vectors quantize to a power-of-two grid (`floor(x*4096+0.5)` as
  * BIGINT) and every dot / squared-norm / squared-L2 is an exact integer sum,
  * bit-identical in any engine regardless of fold order.
  *
  * The composed spellings — `aggregate(zip_with(qa, qb, (a,b) -> a*b), 0L,
  * (acc,x) -> acc+x)` and friends — are higher-order functions, which Spark
  * evaluates as interpreted lambdas (HigherOrderFunction is CodegenFallback):
  * per element per row they allocate a zipped struct and dispatch two lambda
  * closures. These expressions emit the same ascending-index fold as one
  * fused primitive loop. Long arithmetic is exact and order-insensitive here,
  * so results are REQUIRED to be byte-identical — the DuckDB oracles of every
  * routed query are unchanged (QVectorExpressionsSpec pins equivalence,
  * including null/length-pad semantics).
  *
  * Accumulators are Java longs with wrap-on-overflow — identical to the
  * composed form's `acc + x` Catalyst Add on LongType (non-ANSI), so even the
  * (out-of-contract) overflow behavior matches.
  */
abstract class QVectorBinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }
}

/** `graft_qdot(a, b)` — Σ a(i)·b(i) over BIGINT arrays, ascending i.
  *
  * Null/length semantics replicate the composed
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, (acc,v) -> acc+v)` form
  * exactly: mismatched lengths (zip_with null-pads the shorter side) or any
  * null element yield NULL — so routing a query through this kernel is a
  * pure strength reduction, never a semantics change. */
case class QDotProduct(left: Expression, right: Expression) extends QVectorBinaryExpression {
  override def prettyName: String = "graft_qdot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i); i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName for every local — two kernels in one projection over
      // NON-nullable children share a scope (see DotProduct.doGenCode)
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QDotProduct =
    copy(left = l, right = r)
}

/** `graft_ql2(a, b)` — Σ (a(i)−b(i))² over BIGINT arrays, ascending i: the
  * exact-integer squared-L2 distance the PQ assign steps rank on
  * (`pqAssignAllQ`). Same null/length semantics as [[QDotProduct]] — the
  * composed `zip_with(a, b, (x,y) -> (x-y)*(x-y))` null-pads mismatched
  * lengths into a NULL sum. */
case class QL2Distance(left: Expression, right: Expression) extends QVectorBinaryExpression {
  override def prettyName: String = "graft_ql2"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      s += d * d; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
      val (acc, d) = (ctx.freshName("acc"), ctx.freshName("d"))
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = $x.getLong($i) - $y.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QL2Distance =
    copy(left = l, right = r)
}

/** `graft_qmatmul(v, planes)` — all P dot products of BIGINT vector `v`
  * against a P×d BIGINT matrix in ONE fused pass: result(p) = Σ v(i)·planes(p)(i).
  *
  * This is the LSH signature shape (`lshBands`: 150 hyperplane projections
  * per vector): the composed `transform(planes, w -> graft_qdot(v, w))` pays
  * the higher-order-function toll P times per row — lambda binding plus an
  * ArrayData element walk with a virtual `getLong` per element. When
  * `planes` is foldable (the compile-time plane matrix, the only way the
  * registry calls it), the matrix is unpacked ONCE into a primitive
  * `long[][]` and every row runs a pure primitive-array loop.
  *
  * Per-element semantics mirror the composed transform form: the output has
  * one entry per plane; entry p is NULL if plane p is null, has a length
  * ≠ |v|, or either side has a null element at a compared position. A NULL
  * `v` or NULL `planes` yields NULL (the transform form would produce an
  * all-null array for a null `v` captured by the lambda — this kernel takes
  * `v` as a proper argument, so null-in/null-out applies; no registry data
  * carries null vectors, and the spec pins both behaviors). */
case class QMatVec(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_qmatmul"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<array<bigint>>) arguments")
    }

  /** Foldable plane matrix unpacked to primitives once per expression
    * instance (shared by all rows of a task); null when the matrix is not
    * foldable or any plane contains a null element (generic path then). */
  @transient private lazy val foldedPlanes: Array[Array[Long]] =
    if (!right.foldable) null
    else right.eval(null) match {
      case pm: ArrayData =>
        val p = pm.numElements()
        val out = new Array[Array[Long]](p)
        var i = 0
        var clean = true
        while (i < p && clean) {
          if (pm.isNullAt(i)) clean = false
          else {
            val w = pm.getArray(i)
            val n = w.numElements()
            var j = 0
            while (j < n && clean) { if (w.isNullAt(j)) clean = false else j += 1 }
            if (clean) out(i) = w.toLongArray()
          }
          i += 1
        }
        if (clean) out else null
      case _ => null
    }

  /** One row's projections against a primitive matrix — the hot loop. */
  private def evalFast(x: ArrayData, planes: Array[Array[Long]]): ArrayData = {
    val n = x.numElements()
    var hasNullElem = false
    var i = 0
    while (i < n && !hasNullElem) { if (x.isNullAt(i)) hasNullElem = true else i += 1 }
    val xs = if (hasNullElem) null else x.toLongArray()
    val out = new Array[Any](planes.length)
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      if (hasNullElem || w.length != n) out(p) = null
      else {
        var s = 0L
        var j = 0
        while (j < n) { s += xs(j) * w(j); j += 1 }
        out(p) = s
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def evalGeneric(x: ArrayData, pm: ArrayData): ArrayData = {
    val n = x.numElements()
    var hasNullElem = false
    var i = 0
    while (i < n && !hasNullElem) { if (x.isNullAt(i)) hasNullElem = true else i += 1 }
    val out = new Array[Any](pm.numElements())
    var p = 0
    while (p < pm.numElements()) {
      if (pm.isNullAt(p)) out(p) = null
      else {
        val w = pm.getArray(p)
        if (hasNullElem || w.numElements() != n) out(p) = null
        else {
          var s = 0L
          var j = 0
          var oneNull = false
          while (j < n && !oneNull) {
            if (w.isNullAt(j)) oneNull = true
            else { s += x.getLong(j) * w.getLong(j); j += 1 }
          }
          out(p) = if (oneNull) null else s
        }
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (foldedPlanes != null) evalFast(x, foldedPlanes)
    else evalGeneric(x, b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (foldedPlanes != null) {
      val planesRef = ctx.addReferenceObj("qmatPlanes", foldedPlanes, "long[][]")
      val self = ctx.addReferenceObj("qmatSelf", this, classOf[QMatVec].getName)
      nullSafeCodeGen(ctx, ev, (x, _) =>
        s"${ev.value} = $self.fastPath($x, $planesRef);")
    } else {
      val self = ctx.addReferenceObj("qmatSelf", this, classOf[QMatVec].getName)
      nullSafeCodeGen(ctx, ev, (x, y) =>
        s"${ev.value} = $self.genericPath($x, $y);")
    }
  }

  // public bridges for generated code
  def fastPath(x: ArrayData, planes: Array[Array[Long]]): ArrayData = evalFast(x, planes)
  def genericPath(x: ArrayData, pm: ArrayData): ArrayData = evalGeneric(x, pm)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QMatVec =
    copy(left = l, right = r)
}

/** `graft_qnorm2(a)` — Σ a(i)² over a BIGINT array: the exact-integer squared
  * norm (`qn2`) every grid cosine divides by. Matches the composed
  * `aggregate(a, 0L, (acc,x) -> acc + x*x)`: any null element yields NULL. */
case class QNorm2(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_qnorm2"
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires an array<bigint> argument")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = x.getLong(i)
      s += v * v; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val (n, i) = (ctx.freshName("n"), ctx.freshName("i"))
      val (acc, v) = (ctx.freshName("acc"), ctx.freshName("v"))
      s"""
         |int $n = $x.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $v = $x.getLong($i);
         |  $acc += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QNorm2 = copy(child = c)
}
