package graft.pipeline

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One pipeline model — the Spark equivalent of a dbt model: a named,
  * dependency-declaring `DataFrame` transformation.
  *
  * The reference engine (danolen/dbt-lakehouse-aws) is exactly a DAG scheduler
  * over CTAS statements (SURVEY.md §3.1); `Model` + [[DagRunner]] is that
  * engine re-expressed in Scala. `build` receives a resolver for upstream
  * models/sources, mirroring dbt's `ref()`/`source()`.
  */
trait Model {
  def name: String
  def deps: Seq[String]
  def build(spark: SparkSession, in: String => DataFrame): DataFrame
}

/** Convenience constructor for inline models. */
object Model {
  def apply(n: String, d: Seq[String])(
      f: (SparkSession, String => DataFrame) => DataFrame): Model = new Model {
    val name = n
    val deps = d
    def build(spark: SparkSession, in: String => DataFrame): DataFrame = f(spark, in)
  }
}

/** Topologically sorts and executes a model DAG.
  *
  * Ordering follows TRUE dependencies, not layer names — the reference has a
  * mart→stage back-edge (`mart_sgp_factors` feeds stage models,
  * models/stage/projections/preseason/hitting/stg_proj_preseason_hitting_sgp_oc.sql:39-41)
  * so a layer-ordered runner would deadlock (SURVEY.md §7.4).
  *
  * Materialization modes:
  *   - `materializeDir = Some(dir)`: each model is written to parquet and read
  *     back — dbt's `materialized='table'` pipeline-breaker semantics; every
  *     model optimizes in isolation, intermediate state is inspectable.
  *   - `materializeDir = None`: models stay as composed (lazy) DataFrames and
  *     Catalyst optimizes ACROSS model boundaries (column pruning through the
  *     whole DAG) — the fused mode the reference engine cannot do. Same
  *     results; strictly less work at scale.
  */
final class DagRunner(models: Seq[Model], sources: Map[String, DataFrame] = Map.empty) {

  private val byName: Map[String, Model] = models.map(m => m.name -> m).toMap
  require(byName.size == models.size, "duplicate model names")

  /** Dependency-closure topological order (deterministic: insertion DFS). */
  lazy val topoOrder: Seq[String] = {
    val visiting = mutable.LinkedHashSet[String]()
    val done = mutable.LinkedHashSet[String]()
    def visit(n: String): Unit = {
      if (!done.contains(n) && byName.contains(n)) {
        require(!visiting.contains(n), s"dependency cycle at $n: ${visiting.mkString(" -> ")}")
        visiting += n
        byName(n).deps.foreach(visit)
        visiting -= n
        done += n
      }
    }
    models.map(_.name).foreach(visit)
    done.toSeq
  }

  /** Builds every model; returns the materialized (or composed) frames. */
  def run(spark: SparkSession, materializeDir: Option[String] = None): Map[String, DataFrame] = {
    val built = mutable.LinkedHashMap[String, DataFrame]()
    def resolve(n: String): DataFrame =
      built.getOrElse(n, sources.getOrElse(n,
        throw new NoSuchElementException(s"unknown ref/source: $n")))
    topoOrder.foreach { n =>
      val df = byName(n).build(spark, resolve)
      built(n) = materializeDir match {
        case Some(dir) =>
          val path = s"$dir/$n"
          df.write.mode("overwrite").parquet(path)
          spark.read.parquet(path)
        case None => df
      }
    }
    built.toMap
  }
}
