package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-JVM properties of the DAG scheduler (no SparkSession needed: build
  * functions are never invoked by `topoOrder`). Uses scalacheck generators
  * directly (scalatestplus bridge isn't on the classpath). */
class DagRunnerSpec extends AnyFunSuite {

  private def model(n: String, deps: Seq[String]): Model =
    Model(n, deps)((_: SparkSession, _: String => DataFrame) =>
      throw new UnsupportedOperationException("not built in this test"))

  /** Random DAGs: nodes 0..n-1, each depending on a subset of lower ids
    * (guarantees acyclicity), then presented in shuffled order. */
  private val dagGen: Gen[Seq[Model]] = for {
    n <- Gen.choose(1, 40)
    deps <- Gen.sequence[Seq[Seq[Int]], Seq[Int]](
      (0 until n).map(i => Gen.someOf(0 until i).map(_.toSeq)))
    seed <- Gen.long
  } yield {
    val perm = new scala.util.Random(seed).shuffle((0 until n).toList)
    perm.map(i => model(s"m$i", deps(i).map(d => s"m$d")))
  }

  test("topoOrder places every model after all of its dependencies (100 random DAGs)") {
    (1 to 100).foreach { i =>
      val models = dagGen(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed at $i"))
      val order = new DagRunner(models).topoOrder
      assert(order.size == models.size)
      val pos = order.zipWithIndex.toMap
      models.foreach(m =>
        m.deps.foreach(d => assert(pos(d) < pos(m.name),
          s"$d must precede ${m.name} in $order")))
    }
  }

  test("cycles are rejected with the offending node named") {
    val cyclic = Seq(
      model("a", Seq("c")), model("b", Seq("a")), model("c", Seq("b")))
    val e = intercept[IllegalArgumentException](new DagRunner(cyclic).topoOrder)
    assert(e.getMessage.contains("cycle"))
  }

  test("duplicate model names are rejected") {
    val dup = Seq(model("a", Nil), model("a", Nil))
    intercept[IllegalArgumentException](new DagRunner(dup).topoOrder)
  }

  test("deps outside the registry are treated as externally-provided sources") {
    val m = Seq(model("a", Seq("external_source")))
    assert(new DagRunner(m).topoOrder == Seq("a"))
  }
}
