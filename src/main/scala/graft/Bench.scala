package graft
import org.apache.spark.sql.SparkSession
/** Per-round benchmark surface: one JSON line with per-query seconds.
  *
  * Each query runs `Reps` times (JVM/codegen warm after the first) and
  * reports the MEDIAN — the host VM's wall clock swings 5-10x under
  * contention (BASELINE.md's variance caveat), so a single sample can't
  * distinguish a regression from a noisy neighbor; the median of 3
  * self-defends. Failures are recorded as negative durations (-1.0) and
  * listed in a `failed` field so a broken query can never masquerade as a
  * fast one.
  */
object Bench {
  private val Reps = 3

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val samples = (1 to Reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // noop sink evaluates EVERY output column — count() would let
        // Catalyst prune computed columns and under-measure the real work
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        // queries may cache intermediates; drop them so reps measure the
        // full pipeline and later queries aren't slowed by eviction thrash
        spark.catalog.clearCache()
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      val median =
        if (samples.isEmpty) -1.0
        else samples.sorted.apply(samples.size / 2)
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"reps":$Reps,"sf":"$sfDir"}"""
    println(line)
    // Also persist the full line to a file: the driver captures only the
    // stdout TAIL, which has truncated past rounds' per-query entries —
    // the in-repo artifact keeps the record self-sufficient.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
  }
}
