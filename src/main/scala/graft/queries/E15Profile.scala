package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: old (full-vocab postings) vs new (query-token-restricted)
  * BM25 branch of e15. `runMain graft.queries.E15Profile [sfDir]`. */
object E15Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[e15] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("len", size(col("w")))
    def lexOld() = {
      val postings = docs
        .select(col("doc_id"), col("len"), explode(col("w")).as("tok"))
        .groupBy(col("doc_id"), col("len"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val qterms = postings.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("tok")).distinct()
      postings.join(broadcast(qterms), Seq("tok"))
        .filter(col("doc_id") =!= col("qid"))
        .join(broadcast(dfreq), Seq("tok"))
        .groupBy(col("qid"), col("doc_id")).agg(sum(col("tf")).as("s"))
    }
    def lexNew() = {
      val qtokens = docs.filter(col("doc_id") < 10)
        .select(explode(col("w")).as("tok")).distinct()
      val postings = docs
        .select(col("doc_id"), col("len"), explode(col("w")).as("tok"))
        .join(broadcast(qtokens), Seq("tok"), "left_semi")
        .groupBy(col("doc_id"), col("len"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val qterms = postings.filter(col("doc_id") < 10)
        .select(col("doc_id").as("qid"), col("tok")).distinct()
      postings.join(broadcast(qterms), Seq("tok"))
        .filter(col("doc_id") =!= col("qid"))
        .join(broadcast(dfreq), Seq("tok"))
        .groupBy(col("qid"), col("doc_id")).agg(sum(col("tf")).as("s"))
    }
    noop(lexOld()); noop(lexNew()) // warm
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("lex branch OLD (full vocab)") { noop(lexOld()) }
      time("lex branch NEW (q-token restricted)") { noop(lexNew()) }
      val q = graft.SparkEntry.queries("e15_hybrid_rrf_retrieval")
      time("full e15 (current code)") { noop(q(spark, sfDir)) }
    }
    spark.stop()
  }
}
