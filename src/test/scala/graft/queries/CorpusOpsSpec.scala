package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Unit coverage for the corpus-curation pack: connected-components
  * convergence on hand graphs, split determinism/stability, funnel
  * monotonicity, and the two-level prefix scan vs the naive global window. */
class CorpusOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    val jp = pairs.toDF("u", "v")
    val edges = jp.union(jp.select(col("v"), col("u")))
    CorpusOps.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connected components: transitive chains collapse to the min label") {
    // two components: {1,2,3} via 1-2, 2-3 and {5,6}; no direct 1-3 edge
    val got = components(Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L), s"got $got")
  }

  test("connected components: a long path needs multiple propagation rounds") {
    // path 10-11-...-17: diameter 7, forces several min-propagation rounds;
    // plus a star rooted at 30 whose min sits at a leaf (29)
    val path = (10L until 17L).map(i => (i, i + 1))
    val star = Seq((30L, 29L), (30L, 31L), (30L, 32L))
    val got = components(path ++ star)
    assert((10L to 17L).forall(got(_) == 10L), s"path must collapse to 10: $got")
    assert(Seq(29L, 30L, 31L, 32L).forall(got(_) == 29L), s"star must collapse to 29: $got")
  }

  test("connected components match a union-find oracle on random graphs", graft.Slow) {
    // 8 seeded random graphs, each checked against a plain driver-side
    // union-find — the distributed fixpoint must agree exactly on every node
    (1 to 8).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 10 + rnd.nextInt(30)
      val pairs = Seq.fill(5 + rnd.nextInt(40))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        // union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> {
          // component id = min member: min over all nodes sharing the root
          val r = find(x)
          parent.keys.filter(find(_) == r).min
        }).toMap
        val got = components(pairs)
        assert(got == want, s"seed=$seed edges=$pairs\ngot=$got\nwant=$want")
      }
    }
  }

  test("d13 split: deterministic, stable under corpus growth, ~10% test") {
    val full = graft.SparkEntry.queries("d13_split_assign")(spark, sfDir)
    val n = full.count()
    val testN = full.filter(col("split") === "test").count()
    // 26/256 = 10.2% expected; the fixture is small so allow a wide band,
    // but the assignment itself is exact and re-derivable
    assert(testN > 0 && testN < n / 4, s"test share off: $testN of $n")
    // stability: recomputing on any subset yields the same labels (pure
    // per-row hash — no dependence on what else is in the corpus)
    val again = graft.SparkEntry.queries("d13_split_assign")(spark, sfDir)
    assert(full.exceptAll(again).count() == 0 && again.exceptAll(full).count() == 0)
  }

  test("d14 funnel: stage survivor counts are monotone non-increasing") {
    val rows = graft.SparkEntry.queries("d14_quality_funnel")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val order = Seq("r0_total", "r1_words", "r2_wordlen", "r3_symbols", "r4_stopword")
    val counts = order.map(rows)
    assert(counts.head > 0, "fixture must be non-empty")
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must only shrink: ${order.zip(counts)}")
  }

  test("d17 bigram log-prob matches a hand-computed two-doc model") {
    val sp = spark
    import sp.implicits._
    // corpus: c("a b")=3, c("b c")=1, c("b a")=1; prefixes: c(a .)=3, c(b .)=2
    val docs = Seq((1L, "a b c"), (2L, "a b a b")).toDF("doc_id", "text")
    val got = CorpusOps.bigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 1: ln(3/3) + ln(1/2); doc 2: 2*ln(3/3) + ln(1/2)
    val half = math.log(0.5)
    assert(got(1L)._1 == 2 && got(2L)._1 == 3, s"bigram counts: $got")
    assert(math.abs(got(1L)._2 - half) < 1e-9, s"doc 1 logprob: ${got(1L)}")
    assert(math.abs(got(2L)._2 - half) < 1e-9, s"doc 2 logprob: ${got(2L)}")
  }

  test("prefixSum: every depth agrees with the driver-side running sum, gappy ids included") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(17)
    // sparse, gappy order keys: blocks are uneven on purpose
    val rows = (0 until 3000).map(i => (i.toLong * 7 + rnd.nextInt(5), rnd.nextInt(50).toLong))
      .distinctBy(_._1).sortBy(_._1)
    val df = rows.toDF("id", "x")
    val expect = rows.scanLeft((0L, 0L)) { case ((_, acc), (id, x)) => (id, acc + x) }
      .drop(1).toMap
    for (depth <- 1 to 3) {
      val got = CorpusOps.prefixSum(df, "id", "x", fanout = 10L, depth = depth)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expect, s"depth=$depth")
    }
  }

  test("d12 components survive a reliable checkpoint dir (spark.graft.checkpointDir)") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val jp = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("u", "v")
      val edges = jp.union(jp.select(col("v"), col("u")))
      val got = CorpusOps.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // the reliable path actually wrote checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, s"reliable checkpoint must write files under $dir")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
    }
  }

  test("d15 two-level prefix scan equals the naive global cumulative sum") {
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    val tok = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    // naive single-partition scan (the anti-pattern, fine as a test oracle)
    val wAll = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = tok.withColumn("cum", sum(col("n_tok")).over(wAll))
      .withColumn("shard", expr("(cum - n_tok) div 4096"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("shard_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    val fast = graft.SparkEntry.queries("d15_pack_token_budget")(spark, sfDir)
    assert(fast.exceptAll(naive).count() == 0 && naive.exceptAll(fast).count() == 0,
      "block-scan + offsets must reproduce the global scan exactly")
    // shards respect the budget: every shard starts strictly under 4096
    // tokens of its boundary (a doc may straddle the boundary by design)
    assert(fast.count() > 1, "fixture should span multiple shards")
  }

  test("d51 BPE loop: vocabulary grows one symbol per round, merges stay productive") {
    // the oracle pins the VALUES; this pins the training-dynamics shape the
    // loop exists for — each round must add exactly one new symbol (the
    // merged token; no source char vanishes on this corpus), apply a
    // positive number of merges, and pick a fresh ≥2-char token
    val rows = graft.SparkEntry.queries("d51_bpe_train_loop")(spark, sfDir)
      .orderBy("round").collect()
    assert(rows.length == 5)
    val tokens = rows.map(_.getAs[String]("merged_token"))
    assert(tokens.distinct.length == 5, s"winners must be distinct: ${tokens.toSeq}")
    assert(tokens.forall(_.length >= 2), s"merged tokens expand to >=2 chars: ${tokens.toSeq}")
    rows.foreach(r => assert(r.getAs[Long]("n_merges") > 0,
      s"round ${r.getAs[Int]("round")} applied no merges"))
    val vocab = rows.map(_.getAs[Long]("vocab_size"))
    assert(vocab.zip(vocab.tail).forall { case (a, b) => b == a + 1 },
      s"vocabulary must grow by exactly the merged symbol per round: ${vocab.toSeq}")
  }
}
