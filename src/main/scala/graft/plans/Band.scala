package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.types.LongType

/** User-facing face of the native [[BandJoin]] operator. */
object Band {

  /** Idempotently install [[BandJoinStrategy]] into the session planner. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(BandJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BandJoinStrategy

  /** Band join `early` with `late`: every (early, late) pair sharing `key`
    * with 0 < late.ts - early.ts <= range. Output columns are early's then
    * late's (the two sides must not share column names besides `key`, which
    * the caller disambiguates by renaming). Both ts columns must be LONG
    * (epoch micros/millis — `range` is in the same unit); key types must
    * match across sides.
    */
  def join(early: DataFrame, late: DataFrame, key: String,
           earlyTs: String, lateTs: String, range: Long): DataFrame = {
    val spark = early.sparkSession
    install(spark)
    val lPlan = early.queryExecution.analyzed
    // Re-alias the late side: band joins are commonly self-joins, and shared
    // lineage would let analyzer relation-dedup rewrite one child's attr ids
    // underneath this node's already-bound expressions (same trap as AsOf).
    val rPlan = late
      .select(late.columns.toIndexedSeq.map(c =>
        org.apache.spark.sql.functions.col(c).as(c)): _*)
      .queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String): Attribute =
      plan.output.find(_.name == name)
        .getOrElse(sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
    val (lkA, rkA) = (attr(lPlan, key), attr(rPlan, key))
    require(lkA.dataType == rkA.dataType,
      s"band join key type mismatch: early $key is ${lkA.dataType}, late is ${rkA.dataType}")
    val (ltA, rtA) = (attr(lPlan, earlyTs), attr(rPlan, lateTs))
    require(ltA.dataType == LongType && rtA.dataType == LongType,
      s"band join ts columns must be LONG, got ${ltA.dataType}/${rtA.dataType}")
    require(range > 0, "band range must be positive")
    val node = BandJoin(lPlan, rPlan, lkA, rkA, ltA, rtA, range)
    org.apache.spark.sql.graftbridge.GraftSqlBridge.ofRows(spark, node)
  }
}
