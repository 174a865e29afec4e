package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.{GQuery, QueryPack, Tables}

/** Similarity search over the `embeddings` table (64-dim float vectors):
  * brute-force cosine top-k (baseline), hyperplane-LSH bucketed ANN (scale
  * path), per-label centroids (IVF building block), and cosine near-dup pairs.
  *
  * All vector math is plain Catalyst expressions (`transform`/`zip_with`/
  * `aggregate`) — no UDFs, stays codegen-friendly. Floats are cast to double
  * once, and dot products fold sequentially so both engines sum in the same
  * order.
  */
object VectorOps extends QueryPack {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine over double arrays via the native codegen kernel
    * [[graft.functions.CosineSimilarity]] — a fused one-pass loop instead of
    * interpreted aggregate/zip_with lambdas (same ascending-index fold, so
    * results are bit-identical to the composed form). */
  private def cosine(a: String, b: String): Column = expr(s"graft_cosine($a, $b)")

  private def embDouble(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    t(s, dir, "embeddings").select(col("vec_id"), col("label"),
      asDouble(col("embedding")).as("v"))
  }

  // ---- E1: brute-force cosine top-k (the exactness baseline) --------------------
  private val e1 = GQuery(
    "e1_ann_bruteforce_topk",
    (s, dir) => {
      val emb = embDouble(s, dir)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val c = emb.select(col("vec_id").as("nid"), col("v").as("nv"))
      // Query side is tiny: broadcast it so the candidate scan never shuffles.
      val sims = c.crossJoin(broadcast(q))
        .filter(col("qid") =!= col("nid"))
        .withColumn("sim", round(cosine("qv", "nv"), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("qid"), col("nid"), col("sim"), col("rn"))
    },
    Some("""WITH e AS (
           |  SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
           |         generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY vec_id),
           |q AS (SELECT * FROM e WHERE vec_id < 10),
           |dots AS (
           |  SELECT q.vec_id AS qid, c.vec_id AS nid, sum(q.x * c.x) AS dp
           |  FROM q JOIN e c ON q.i = c.i AND q.vec_id != c.vec_id
           |  GROUP BY 1, 2),
           |sims AS (
           |  SELECT qid, nid, round(dp / (nq.nrm * nc.nrm), 6) AS sim
           |  FROM dots
           |  JOIN norms nq ON qid = nq.vec_id
           |  JOIN norms nc ON nid = nc.vec_id)
           |SELECT qid, nid, sim, rn FROM (
           |  SELECT qid, nid, sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
           |  FROM sims) sub
           |WHERE rn <= 10""".stripMargin),
    doc = "Brute-force cosine top-10 per query vector (similarity #1).")

  // ---- E2: hyperplane-LSH bucketed ANN (the scale path; rows-only check) ----------
  // 16 signed random hyperplanes -> 16-bit signature; queries only score
  // candidates sharing one of four 4-bit signature bands (IVF-style pruning).
  private val Planes = 16
  private val Dim = 64
  private val planeW: Array[Array[Int]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(Planes, Dim)(if (rnd.nextBoolean()) 1 else -1)
  }

  private val e2 = GQuery(
    "e2_ann_lsh_bucketed",
    (s, dir) => {
      import s.implicits._
      val emb = embDouble(s, dir)
      val planes = planeW.zipWithIndex.flatMap { case (w, p) =>
        w.zipWithIndex.map { case (wt, i) => (p, i, wt.toDouble) }
      }.toSeq.toDF("p", "i", "wt")
      // signature: bit p = sign(sum_i v[i] * w[p][i]); dataflow form scales
      // (explode + broadcast-join + reaggregate, no per-row python).
      val comps = emb.select(col("vec_id"), posexplode(col("v")).as(Seq("i", "x")))
        .join(broadcast(planes), Seq("i"))
        .groupBy(col("vec_id"), col("p"))
        .agg(sum(col("x") * col("wt")).as("proj"))
        .withColumn("bit", when(col("proj") > 0, 1L).otherwise(0L))
      val sigs = comps.groupBy(col("vec_id"))
        .agg(sum(expr("shiftleft(bit, cast(p as int))")).as("sig"))
      val banded = sigs.select(col("vec_id"), explode(expr(
        "array(" + (0 until 4).map(b =>
          s"struct($b as band, shiftright(sig, ${b * 4}) & 15 as bh)").mkString(",") +
          ")")).as("x"))
        .select(col("vec_id"), col("x.band"), col("x.bh"))
      val q = banded.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("band"), col("bh"))
      val cand = q.join(banded.withColumnRenamed("vec_id", "nid"), Seq("band", "bh"))
        .filter(col("qid") =!= col("nid"))
        .select(col("qid"), col("nid")).distinct()
      val withV = cand
        .join(emb.select(col("vec_id").as("qid"), col("v").as("qv")), Seq("qid"))
        .join(emb.select(col("vec_id").as("nid"), col("v").as("nv")), Seq("nid"))
        .withColumn("sim", round(cosine("qv", "nv"), 6))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      withV.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("qid"), col("nid"), col("sim"), col("rn"))
    },
    None,
    doc = "Sign-LSH bucketed ANN; scores only bucket mates (similarity #2).")

  // ---- E3: per-label centroids (IVF coarse quantizer building block) --------------
  private val e3 = GQuery(
    "e3_label_centroids",
    (s, dir) =>
      embDouble(s, dir)
        .select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(round(avg(col("x")), 6).as("centroid"), count(lit(1)).as("n")),
    Some("""SELECT label, dim, round(avg(x), 6) AS centroid, count(*) AS n FROM (
           |  SELECT label, unnest(embedding::DOUBLE[]) AS x,
           |         CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim
           |  FROM embeddings) sub
           |GROUP BY label, dim""".stripMargin),
    doc = "Per-cluster mean vectors — IVF coarse centroids (similarity #3).")

  // ---- E4: IVF probe search — coarse quantize to centroids, scan 2 cells -------------
  // The label column is the (pre-assigned) coarse cluster; centroids are the
  // per-label means (e3). Queries score all centroids (tiny), pick nprobe=2
  // cells, and scan only those cells' vectors — the classic IVF recall/cost
  // trade, expressed as joins the optimizer can distribute.
  private val e4 = GQuery(
    "e4_ann_ivf_probe",
    (s, dir) => {
      val emb = embDouble(s, dir)
      val cent = emb.select(col("label"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim")).agg(avg(col("x")).as("c"))
        .groupBy(col("label"))
        .agg(expr("transform(sort_array(collect_list(struct(dim, c))), p -> p.c)").as("cv"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("label"))
      val probes = q.crossJoin(broadcast(cent))
        .withColumn("csim", cosine("qv", "cv"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= 2)
        .select(col("qid"), col("qv"), col("label"))
      val cand = broadcast(probes)
        .join(emb.select(col("vec_id").as("nid"), col("label"), col("v").as("nv")), Seq("label"))
        .filter(col("qid") =!= col("nid"))
        .withColumn("sim", round(cosine("qv", "nv"), 6))
      val wTop = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))
      cand.withColumn("rn", row_number().over(wTop)).filter(col("rn") <= 10)
        .select(col("qid"), col("nid"), col("sim"), col("rn"))
    },
    Some("""WITH e AS (
           |  SELECT vec_id, label, unnest(embedding::DOUBLE[]) AS x,
           |         generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |cent AS (SELECT label, i, avg(x) AS cx FROM e GROUP BY 1, 2),
           |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY 1),
           |cnorm AS (SELECT label, sqrt(sum(cx * cx)) AS cn FROM cent GROUP BY 1),
           |q AS (SELECT * FROM e WHERE vec_id < 10),
           |qc AS (
           |  SELECT q.vec_id AS qid, c.label, sum(q.x * c.cx) AS dp
           |  FROM q JOIN cent c ON q.i = c.i GROUP BY 1, 2),
           |probe AS (
           |  SELECT qid, label FROM (
           |    SELECT qid, qc.label, row_number() OVER (
           |      PARTITION BY qid ORDER BY dp / (nq.nrm * cn.cn) DESC, qc.label) AS rn
           |    FROM qc JOIN norms nq ON qid = nq.vec_id JOIN cnorm cn ON qc.label = cn.label) z
           |  WHERE rn <= 2),
           |cand AS (
           |  SELECT p.qid, e.vec_id AS nid, e.i, e.x
           |  FROM probe p JOIN e ON e.label = p.label AND e.vec_id != p.qid),
           |dots AS (
           |  SELECT c.qid, c.nid, sum(q.x * c.x) AS dp
           |  FROM cand c JOIN e q ON q.vec_id = c.qid AND q.i = c.i GROUP BY 1, 2),
           |sims AS (
           |  SELECT qid, nid, round(dp / (nq.nrm * nc.nrm), 6) AS sim
           |  FROM dots JOIN norms nq ON qid = nq.vec_id JOIN norms nc ON nid = nc.vec_id)
           |SELECT qid, nid, sim, rn FROM (
           |  SELECT qid, nid, sim,
           |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
           |  FROM sims) sub
           |WHERE rn <= 10""".stripMargin),
    doc = "IVF: rank centroids, probe 2 cells, exact-score within cells (similarity #4).")

  // ---- D9: embedding-cosine near-dup pairs ------------------------------------------
  private val d9 = GQuery(
    "d9_dedup_embedding_cosine",
    (s, dir) => {
      val emb = embDouble(s, dir)
      val a = emb.select(col("vec_id").as("vec_a"), col("v").as("va"))
      val b = emb.select(col("vec_id").as("vec_b"), col("v").as("vb"))
      a.join(b, col("vec_a") < col("vec_b"))
        .withColumn("sim", round(cosine("va", "vb"), 6))
        .filter(col("sim") >= 0.4)
        .select(col("vec_a"), col("vec_b"), col("sim"))
    },
    Some("""WITH e AS (
           |  SELECT vec_id, unnest(embedding::DOUBLE[]) AS x,
           |         generate_subscripts(embedding, 1) AS i
           |  FROM embeddings),
           |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM e GROUP BY vec_id),
           |dots AS (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, sum(a.x * b.x) AS dp
           |  FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
           |  GROUP BY 1, 2)
           |SELECT vec_a, vec_b, round(dp / (na.nrm * nb.nrm), 6) AS sim
           |FROM dots
           |JOIN norms na ON vec_a = na.vec_id
           |JOIN norms nb ON vec_b = nb.vec_id
           |WHERE round(dp / (na.nrm * nb.nrm), 6) >= 0.4""".stripMargin),
    doc = "Embedding-cosine near-duplicate pairs, sim >= 0.4 (dedup #5).")

  override val all: Seq[GQuery] = Seq(e1, e2, e3, e4, d9)
}
