package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: old (fan-out + double countDistinct) vs new (semi join +
  * pre-deduped fan-out) d19 shapes, plus old vs new d55 5-gram branches.
  * `runMain graft.queries.D19Profile [sfDir]`. */
object D19Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p] $label%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    def exTagged() = {
      val split = substring(
        md5(concat(lit("graft-split:"), col("doc_id").cast("string"))), 1, 2)
      val ex0 = TextOps.hashedShingles(docs)
        .withColumn("is_test", split < lit("1a"))
        .select(col("doc_id"), col("is_test"), col("hv"))
        .cache()
      val heavy = ex0.groupBy(col("hv")).agg(count(lit(1)).as("df"))
        .filter(col("df") > TextOps.DfCap)
      ex0.join(broadcast(heavy), Seq("hv"), "left_anti")
    }
    def d19Old() = {
      val ex = exTagged()
      val train = ex.filter(!col("is_test"))
        .select(col("hv"), col("doc_id").as("train_doc")).distinct()
      val test = ex.filter(col("is_test"))
        .select(col("doc_id"), col("hv")).distinct()
      test.join(train, Seq("hv"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("hv")).as("n_shared_shingles"),
          countDistinct(col("train_doc")).as("n_train_docs"))
    }
    val d19New = graft.SparkEntry.queries("d19_decontaminate")
    val base = docs
      .select(col("doc_id"), length(col("text")).as("tl"), split(col("text"), " ").as("w"))
      .withColumn("nw", size(col("w")))
    def d55g5Old() = {
      base.filter(col("nw") >= 5).select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(w) - 4), i -> concat_ws(' '," +
          " element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)," +
          " element_at(w, i + 3), element_at(w, i + 4)))")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_pos"),
          sum(col("c")).as("tot_pos"))
    }
    def d55g5New() = {
      base.filter(col("nw") >= 5)
        .select(col("doc_id"), expr("transform(w, x -> xxhash64(x))").as("hw"))
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(hw) - 4)," +
            " i -> xxhash64(hw[i-1], hw[i], hw[i+1], hw[i+2], hw[i+3]))")).as("g"))
        .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_pos"),
          sum(col("c")).as("tot_pos"))
    }
    noop(d19Old()); noop(d19New(spark, sfDir)); noop(d55g5Old()); noop(d55g5New())
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("d19 OLD (fanout + 2x countDistinct)") { noop(d19Old()) }
      time("d19 NEW (semi + pre-dedup)") { noop(d19New(spark, sfDir)) }
      time("d55 5-gram OLD (strings)") { noop(d55g5Old()) }
      time("d55 5-gram NEW (hashes)") { noop(d55g5New()) }
    }
    spark.stop()
  }
}
