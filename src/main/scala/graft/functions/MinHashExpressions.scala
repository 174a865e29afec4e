package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_minhash(hv, ab)` — the k-permutation MinHash signature of a 64-bit
  * shingle-hash array in one per-document pass.
  *
  * `ab` is a 2k-element constant array [a0, b0, a1, b1, ...]; output element
  * j is min over the hv elements of ((a_j * pmod(hv, P) + b_j) % P) with
  * P = 2^31 - 1 — EXACTLY the arithmetic the composed column form
  * `min((lit(a) * pmod(hv, P) + lit(b)) % P)` evaluates, so a signature
  * computed here from a document's shingle array is bit-identical to one
  * aggregated over the document's exploded posting rows (min is
  * order-insensitive; the modular ops match Java semantics on the same
  * non-negative operands).
  *
  * Why an expression instead of the 128-column min aggregate (r13, guide
  * §1.2): the aggregate form evaluates 128 expressions and updates 128
  * buffer slots PER POSTING ROW through hash-aggregate machinery, and needs
  * its own doc-keyed exchange; this kernel folds the per-doc array that the
  * exact-verify stage materializes anyway — one tight compiled loop per
  * document, no extra shuffle. Interpreted eval (CodegenFallback) is
  * deliberate: the call is per DOCUMENT, so one virtual call amortizes over
  * the n×k inner work and array-returning codegen buys nothing.
  *
  * Null semantics: any null input or null element yields NULL; an empty hv
  * array yields NULL (the aggregate form emitted no row for such a doc —
  * callers feed per-doc arrays that are non-empty by construction).
  */
case class MinHashSignature(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments")
  }

  private val P = 2147483647L // 2^31 - 1

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val hv = a.asInstanceOf[ArrayData]
    val ab = b.asInstanceOf[ArrayData]
    val k = ab.numElements() / 2
    val n = hv.numElements()
    if (n == 0) return null
    val as = new Array[Long](k)
    val bs = new Array[Long](k)
    var j = 0
    while (j < k) {
      if (ab.isNullAt(2 * j) || ab.isNullAt(2 * j + 1)) return null
      as(j) = ab.getLong(2 * j); bs(j) = ab.getLong(2 * j + 1); j += 1
    }
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (hv.isNullAt(i)) return null
      var h = hv.getLong(i) % P
      if (h < 0) h += P
      var m = 0
      while (m < k) {
        val v = (as(m) * h + bs(m)) % P
        if (v < out(m)) out(m) = v
        m += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSignature =
    copy(left = l, right = r)
}
