package graft.queries

import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Registry builders must be side-effect-free: the SQL-form queries create
  * session-unique temp views (Tables.sqlOn) and drop them after analysis,
  * so CONCURRENT construction + execution on one shared session can never
  * collide — the r3-advice hazard, pinned. Spark sessions are thread-safe
  * for concurrent jobs; what this spec proves is that OUR builders are too.
  */
class ConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("SQL-form registry queries build and run concurrently without view collisions", graft.Slow) {
    // every sqlOn-based builder in the registry, three copies each, all at
    // once — fixed view names would collide (wrong results or
    // TABLE_OR_VIEW_NOT_FOUND under the interleaved drops)
    val sqlForm = Seq("q2_min_per_group", "q4_priority_checking",
      "q11_important_stock", "q16_supplier_diversity", "q17_small_quantity_revenue",
      "q20_dominant_supplier", "q21_waiting_supplier", "q22_inactive_high_balance",
      "j10_not_in_null_semantics", "a15_grouping_sets")
    val pool = Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val runs = (1 to 3).flatMap(_ => sqlForm).map { name =>
        Future {
          name -> graft.SparkEntry.queries(name)(spark, sfDir).count()
        }
      }
      val counts = Await.result(Future.sequence(runs), 10.minutes)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      // all three concurrent copies of each query must agree with a
      // clean serial run
      counts.foreach { case (name, got) =>
        val serial = graft.SparkEntry.queries(name)(spark, sfDir).count()
        assert(got == Set(serial),
          s"$name under concurrency: $got != serial $serial")
      }
    } finally pool.shutdown()
  }
}
