package graft

import org.apache.spark.sql.SparkSession

/** Prints `explain(formatted)` for selected registry queries and greps the
  * physical plans for the scale-critical properties (filter/column pushdown,
  * broadcast joins on dimension sides, whole-stage codegen spans) — the
  * feedback loop behind the "would this plan survive 100×?" iteration.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wanted = if (args.length > 1) args.drop(1).toSet else Set(
      "a1_groupby_aggregates", "j1_inner_equijoin", "p6_like_between_in",
      "w1_rownumber_partitioned", "e1_ann_bruteforce_topk", "d3_dedup_minhash_lsh",
      "s4_latest_snapshot", "m2_frame_sample")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.filter(q => wanted.contains(q._1)).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n======== $name ========")
      println(plan)
      val checks = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        // formatted mode tags codegen stages as "[codegen id : N]"
        "WholeStageCodegen" -> plan.contains("codegen id"),
        "BroadcastHashJoin-or-NoJoin" ->
          (!plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin")))
      println(s"[audit] $name " + checks.map { case (k, v) => s"$k=$v" }.mkString(" "))
    }
    spark.stop()
  }
}
