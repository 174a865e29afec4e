package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness: g-family edge-derivation cost split (events scan, JSON
  * extract, per-user window, distinct). `runMain graft.queries.GProfile`. */
object GProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[g] $label%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.catalog.clearCache()
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val ev0 = graft.core.Tables.load(spark, sfDir, "events")
    noop(ev0) // warm
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      time("events scan (noop)") { noop(ev0) }
      val ev = ev0.select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      time("scan + get_json_object (noop)") { noop(ev) }
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val tr = ev.withColumn("nk", lead(col("k"), 1).over(w))
        .filter(col("nk").isNotNull && col("nk") =!= col("k"))
      time("+ per-user lead window (noop)") { noop(tr) }
      time("+ distinct edges (noop)") {
        noop(tr.select(col("k").cast("long").as("src"),
          col("nk").cast("long").as("dst")).distinct())
      }
      time("full g1_pagerank (noop)") {
        noop(graft.SparkEntry.queries("g1_pagerank")(spark, sfDir))
      }
      time("full g4_label_propagation (noop)") {
        noop(graft.SparkEntry.queries("g4_label_propagation")(spark, sfDir))
      }
    }
    spark.stop()
  }
}
