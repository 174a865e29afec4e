package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide installation path: a session built ONLY with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (no register()
  * call, no AsOf.install()) must expose the native functions, the
  * vector-fold rewrite, and the as-of planner strategy — this is exactly
  * what `--conf spark.sql.extensions=...` gives every executor on a real
  * cluster, so it is the path a deployment would actually use.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions alone installs functions, rewrite rule, and strategy") {
    // Extensions only apply at session CONSTRUCTION, and getOrCreate()
    // returns any already-active session — so clear the active/default
    // sessions first to force a genuine construction (sharing the JVM's
    // SparkContext if one is alive), and restore them after instead of
    // stop()ing a context other suites may share.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .appName("graft-extensions-spec")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      val s2 = spark
      import s2.implicits._

      // native functions resolve by name through the injected registry
      val sim = Seq((Array(1.0, 0.0), Array(1.0, 0.0)))
        .toDF("a", "b")
        .selectExpr("graft_cosine(a, b) AS s", "graft_dot(a, b) AS d")
        .head()
      assert(math.abs(sim.getDouble(0) - 1.0) < 1e-12)
      assert(math.abs(sim.getDouble(1) - 1.0) < 1e-12)

      // the optimizer rule rewrites the composed fold to the native kernel
      // (input derives from range() so constant folding can't collapse it
      // before the rewrite is observable)
      val composed = spark.range(1, 2)
        .select(array(col("id").cast("double"), lit(2.0)).as("a"),
          array(lit(3.0), lit(4.0)).as("b"))
        .selectExpr(
          "aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, v) -> acc + v) AS dp")
      val optimized = composed.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot") || optimized.toLowerCase.contains("dotproduct"),
        s"RewriteVectorFolds must fire via extensions:\n$optimized")
      assert(composed.head().getDouble(0) === 11.0)

      // the planner strategy resolves the custom as-of node — built by hand
      // here, NOT via AsOf.join (which self-installs into experimental
      // strategies and would mask the extensions-injected path)
      val left = Seq((1L, 5L, 1L)).toDF("k", "ts", "id")
      val right = Seq((1L, 3L, 2L, 0.25)).toDF("k", "ts", "id", "pv")
      val lPlan = left.queryExecution.analyzed
      val rPlan = right.select(right.columns.map(c => col(c).as(c)): _*)
        .queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
               n: String) = p.output.find(_.name == n).get
      val node = graft.plans.AsOfJoin(lPlan, rPlan,
        attr(lPlan, "k"), attr(rPlan, "k"), attr(lPlan, "ts"), attr(rPlan, "ts"),
        attr(lPlan, "id"), attr(rPlan, "id"), Seq(attr(rPlan, "pv")))
      val asof = org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark, node)
      assert(asof.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(asof.head().getDouble(3) === 0.25)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
