package graft.sources

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** The [[GraftCatalog]] READ path: replace every resolved
  * `DataSourceV2Relation(GraftSqlTable)` with the library's own analyzed
  * read plan, aliased onto the relation's output attributes — at ANALYSIS
  * time, so the whole downstream optimizer (filter pushdown,
  * [[HiddenPartitionPruning]], [[StatsFileSkipping]]) treats a SQL catalog
  * read exactly like a Scala-API `VersionedHiddenTable.read`. This is the
  * TVF splice discipline ([[GraftTableFunctions]]) extended to three-part
  * names and time travel; without it the relation would reach physical
  * planning and [[GraftSqlTable.newScanBuilder]] refuses loudly.
  *
  * DML commands are deliberately left alone: `DeleteFromTable`'s child must
  * STAY a V2 relation for Spark to plan it through [[GraftSqlTable]]'s
  * `SupportsDelete`; write commands (`AppendData`/`OverwriteByExpression`)
  * hold their target outside the child list, so the transform never sees
  * it. */
case class GraftCatalogRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    // O(1) fast path: a plan can only hold a GraftSqlTable relation if a
    // GraftCatalog has been instantiated in this JVM — until then the rule
    // never pays a tree traversal, so the injected extension costs nothing
    // on the (vast) majority of queries that never touch the catalog
    if (!GraftCatalog.instantiated) plan
    else plan match {
      case _: DeleteFromTable => plan
      case _ => plan.resolveOperatorsUp {
        case r: DataSourceV2Relation if r.table.isInstanceOf[GraftSqlTable] =>
          val read = r.table.asInstanceOf[GraftSqlTable].readPlan(spark)
          Project(r.output.zip(read.output).map { case (to, from) =>
            Alias(from, to.name)(exprId = to.exprId)
          }, read)
      }
    }
}

/** Minimal extensions face for the SQL catalog only — sessions that want
  * the catalog but run the rest of the engine through the session-local
  * `register(...)` calls (the Verify/Bench mains) enable THIS class, not
  * the full [[graft.functions.GraftExtensions]], so the optimizer-rule
  * registration story stays single-sourced. */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectResolutionRule(session => GraftCatalogRewrite(session))
}
