package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen vector kernels (SURVEY.md §7.3's "custom surface" escape
  * hatch, exercised for the similarity operators): the composed
  * `aggregate(zip_with(...))` form allocates a zipped array and evaluates a
  * lambda per element per row — fine semantically, but it stays interpreted
  * inside whole-stage codegen. These expressions emit a tight fused loop
  * instead (no allocation, no virtual calls), which is the difference between
  * usable and unusable brute-force similarity at 10^6+ candidate pairs.
  *
  * Accumulation order is ascending-index, identical to the sequential
  * `aggregate` fold they replace — results are bit-identical, so oracle SQL
  * is unchanged.
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments")
  }
}

/** `graft_dot(a, b)` — Σ a(i)·b(i), ascending i. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int n = Math.min($x.numElements(), $y.numElements());
         |double acc = 0.0;
         |for (int i = 0; i < n; i++) {
         |  acc += $x.getDouble(i) * $y.getDouble(i);
         |}
         |${ev.value} = acc;
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `graft_cosine(a, b)` — dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))),
  * all three accumulators in one fused pass. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"""
         |int n = Math.min($x.numElements(), $y.numElements());
         |double dot = 0.0, na = 0.0, nb = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xv = $x.getDouble(i);
         |  double yv = $y.getDouble(i);
         |  dot += xv * yv; na += xv * xv; nb += yv * yv;
         |}
         |${ev.value} = dot / (Math.sqrt(na) * Math.sqrt(nb));
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Optimizer rule: rewrite the composed higher-order-function dot product
  *   `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  * into the fused [[DotProduct]] kernel. Users keep writing the declarative
  * form; the plan gets the tight loop (same ascending fold → same result).
  */
object RewriteVectorFolds extends org.apache.spark.sql.catalyst.rules.Rule[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0, _), DoubleType, _, _) => true
    case _ => false
  }
  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(a, b, LambdaFunction(Multiply(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _)),
        zero,
        LambdaFunction(Add(_: NamedLambdaVariable, _: NamedLambdaVariable, _), _, _),
        LambdaFunction(fin: NamedLambdaVariable, _, _))
      if isZero(zero) && isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}

/** Registration: session-local (temp functions + optimizer rule) for library
  * use, plus a `SparkSessionExtensions` hook for cluster-wide
  * `spark.sql.extensions=graft.functions.GraftExtensions`. */
object GraftFunctions {
  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> { args => DotProduct(args(0), args(1)) },
    "graft_cosine" -> { args => CosineSimilarity(args(0), args(1)) })

  /** Idempotent per-session registration; call before using the functions
    * through `expr("graft_cosine(...)")`. */
  def register(spark: SparkSession): Unit = {
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteVectorFolds))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteVectorFolds
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectOptimizerRule(_ => RewriteVectorFolds)
  }
}
