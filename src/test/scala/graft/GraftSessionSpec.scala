package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The front-door contract: one [[Graft.session]] call gives a SQL user the
  * corpus, the native functions, and the custom-operator wiring without
  * touching any internal API.
  */
class GraftSessionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: org.apache.spark.sql.SparkSession = _

  override def beforeAll(): Unit = {
    spark = Graft.session(master = "local[4]", shufflePartitions = Some(4))
    spark.sparkContext.setLogLevel("ERROR")
    Graft.openCorpus(spark, "/root/testdata/sf0.001")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a SQL user runs TPC-H Q6 text against the opened corpus") {
    val row = spark.sql(
      """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6)))
        |             AS DOUBLE), 4) AS revenue, count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)
      .head()
    assert(row.getLong(1) > 0, "the scan must hit rows")
    assert(row.getDouble(0) > 0.0)
  }

  test("native functions resolve through SQL text") {
    val sim = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS s")
      .head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("every registry query runs against the wired session") {
    // front-door smoke: the flagship entry works on the session as built,
    // no extra configuration
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
