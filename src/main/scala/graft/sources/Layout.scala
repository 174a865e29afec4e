package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for parquet.
  *
  * A time-sorted fact table prunes beautifully on time and not at all on any
  * other column — every file spans the full user/key range, so a key-range
  * scan reads 100% of 100 TB. Writing the table ordered by the interleaved
  * bits of TWO dimensions bounds every file's span in BOTH dimensions
  * (each file covers a contiguous Z-range ≈ a small rectangle in
  * (d1, d2)-space), so parquet min/max footer stats prune files/row-groups
  * for filters on either dimension or both. This is the OPTIMIZE ZORDER
  * pattern lakehouse table formats ship, expressed with nothing but
  * codegen'd bitwise expressions + repartitionByRange — no custom writer.
  *
  * Scale notes: the only driver-side work is one 1-row min/max aggregate
  * (the range-scaling bounds — the bounded-collect discipline). The Z value
  * itself is five shift/mask expressions per dimension (whole-stage
  * codegen'd, no UDF); the write is one range shuffle on Z, which AQE sizes.
  * LayoutSpec quantifies the effect: file-level min/max pruning on the
  * non-time dimension drops most files under a Z-order layout and none
  * under a time-sort.
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (Morton spread):
    * 0b1111 -> 0b1010101. Classic magic-mask sequence, all codegen'd.
    * The input masks to 16 bits FIRST (the sequence's real first step):
    * without it, bits 16-23 survive the 0x00FF00FF mask and alias with low
    * bits — 65536 would spread identically to 256, silently breaking Z
    * monotonicity for unclamped callers (zorderWrite clamps via scaleTo16,
    * but this is a public building block). */
  def mortonSpread16(c: Column): Column = {
    val x0 = c.cast("int").bitwiseAND(lit(0x0000FFFF))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FF))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0F))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555))
  }

  /** Rescale `c` into the 16-bit bucket space [0, 65535] given data bounds.
    * Out-of-range values clamp — late-arriving outliers degrade locality,
    * never correctness (the Z value orders the write; row values are
    * untouched). */
  def scaleTo16(c: Column, lo: Double, hi: Double): Column = {
    val span = math.max(hi - lo, 1e-12)
    least(lit(65535), greatest(lit(0),
      ((c.cast("double") - lit(lo)) / lit(span) * lit(65535.0)).cast("int")))
  }

  /** 32-bit Z value interleaving two 16-bit bucketed dimensions; `a` holds
    * the even bits, `b` the odd. */
  def zValue2(a: Column, b: Column): Column =
    mortonSpread16(a).cast("long")
      .bitwiseOR(shiftleft(mortonSpread16(b).cast("long"), 1))

  /** Write `df` to `path` as parquet clustered on the Z-order of `(c1, c2)`:
    * one min/max aggregate for the scaling bounds, a range shuffle on Z into
    * `numFiles` contiguous Z-slices, a within-partition sort so row groups
    * inside each file are clustered too. */
  def zorderWrite(df: DataFrame, c1: String, c2: String, path: String,
      numFiles: Int): Unit = {
    val b = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    if ((0 to 3).exists(b.isNullAt)) {
      // empty input or an all-null dimension: no bounds exist, so there is
      // nothing to cluster — write the (possibly empty) data as-is instead
      // of NPEing where a plain parquet write would succeed
      df.write.mode("overwrite").parquet(path)
    } else {
      val z = zValue2(
        scaleTo16(col(c1), b.getDouble(0), b.getDouble(1)),
        scaleTo16(col(c2), b.getDouble(2), b.getDouble(3)))
      df.withColumn("__z", z)
        .repartitionByRange(numFiles, col("__z"))
        .sortWithinPartitions(col("__z"))
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    }
    // the payoff of the clustered layout: every file now covers a small
    // rectangle in (c1, c2)-space, so the footer-harvested per-file stats
    // let [[StatsFileSkipping]] drop files at PLAN time for filters on
    // either dimension — not merely row groups at task time
    FileStats.write(df.sparkSession, path)
  }
}
