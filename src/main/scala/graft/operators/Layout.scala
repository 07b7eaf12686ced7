package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering on a space-filling curve — the write-side
  * operator that makes multi-column range scans cheap at warehouse
  * scale. Parquet/ORC readers prune row groups on min/max statistics;
  * sorting by ONE column gives perfect pruning on that column and none
  * on any other, while clustering by the Morton (Z-order) interleaving
  * of several quantized columns gives every interleaved column
  * min/max ranges that shrink like N^(1/d) per file. A 100 TB
  * telemetry lake clustered by z(lon, lat) answers a bounding-box
  * query by reading only the files whose z-range intersects the box's
  * z-cover — the same reason Delta/Iceberg expose OPTIMIZE ZORDER BY;
  * here it is a plain column expression + `repartitionByRange`, no
  * table format required.
  *
  * Reference scope: the reference partitions its parquet export ONLY
  * by `device_date` (`STEP 5 - CPD/05_export_features_to_parquet.py:62-68`)
  * and every spatial query scans all partitions; this operator is part
  * of the beyond-parity scale family.
  *
  * Everything is exact integer bit arithmetic after one documented
  * quantization step, so the DuckDB oracle replays the curve
  * bit-for-bit (the repo-wide integer-parity discipline):
  * [[mortonZSql]] generates the oracle expression from the same bit
  * positions that [[mortonZ]] folds into the Spark plan — the two
  * cannot drift.
  */
object Layout {

  /** Quantize a double into [0, 2^bits) with clamping: floor affine
    * rescale, exactly mirrored by [[quantizeSql]]. The float ops are
    * IEEE-identical on Spark and DuckDB because the expression tree is
    * generated from the same constants in the same order. */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo && bits > 0 && bits <= 20)
    val n = 1L << bits
    least(lit(n - 1), greatest(lit(0L),
      floor((c - lit(lo)) / lit(hi - lo) * lit(n.toDouble)).cast("long")))
  }

  def quantizeSql(c: String, lo: Double, hi: Double, bits: Int): String = {
    val n = 1L << bits
    s"least(${n - 1}, greatest(0, CAST(floor(($c - $lo) / ${hi - lo} * " +
      s"${n.toDouble}) AS BIGINT)))"
  }

  /** Morton interleave of two quantized coordinates: bit i of x lands
    * at bit 2i, bit i of y at bit 2i+1. A fold of shift/and/or on
    * longs — whole-stage-codegen'd, no UDF. */
  def mortonZ(xq: Column, yq: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 20)
    (0 until bits).map { i =>
      shiftleft(shiftright(xq, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(yq, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as a DuckDB SQL expression (oracle twin). */
  def mortonZSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", ") | (", ")")

  /** N-dimensional Morton interleave: bit i of dimension d lands at
    * bit i·n + d (round-robin). Total bits·n must fit a long sign-safe
    * (≤ 62). The 2-D [[mortonZ]] is the n = 2 special case with the
    * same bit layout. */
  def mortonZN(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && bits * dims.size <= 62,
      s"need ≥1 dim and 0 < bits with bits·dims ≤ 62 " +
        s"(got ${dims.size} dims × $bits bits)")
    (for {
      i <- 0 until bits
      (c, d) <- dims.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)),
      i * dims.size + d))
      .reduce(_ bitwiseOR _)
  }

  def mortonZNSql(dims: Seq[String], bits: Int): String = {
    require(dims.nonEmpty && bits > 0 && bits * dims.size <= 62,
      s"need ≥1 dim and 0 < bits with bits·dims ≤ 62 " +
        s"(got ${dims.size} dims × $bits bits)")
    (for {
      i <- 0 until bits
      (c, d) <- dims.zipWithIndex
    } yield s"((($c >> $i) & 1) << ${i * dims.size + d})")
      .mkString("(", ") | (", ")")
  }

  /** Cluster a frame for writing: range-partition on the z-value into
    * `numFiles` output tasks and sort within each, so every output
    * file covers a contiguous z-range (⇒ tight per-file min/max on
    * BOTH interleaved columns). Range partitioning samples boundaries
    * at runtime — correct at any scale, not oracle-replayable, so the
    * oracle-checked query below uses fixed-width z buckets instead and
    * this writer path is spec-gated (LayoutSpec asserts the per-file
    * z-ranges are disjoint). */
  def clusterByZ(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")

  /** Per-bucket layout statistics over fixed-width z ranges (bucket =
    * z >> shift): row count and the min/max of both source coordinates
    * inside each bucket — exactly the file-skipping metadata a
    * clustered write would hand the scan planner. One map-side-combined
    * aggregation; nothing but (bucket, 4 longs, count) shuffles.
    *
    * The bbox bounds are reported as FLOOR-quantized microdegrees
    * (⌊coord·10⁶⌋ as long), not `round(coord, k)` doubles: floor of the
    * same IEEE double is identical on every engine, while decimal
    * rounding of a double is tie-broken differently by Spark (HALF_UP
    * on the shortest decimal representation) and DuckDB (float-space
    * half-away-from-zero) — measured 1-ulp disagreements at the 7th
    * digit on this very query. */
  def zorderStats(df: DataFrame, lon: Column, lat: Column,
      lonLo: Double, lonHi: Double, latLo: Double, latHi: Double,
      bits: Int = 16, bucketShift: Int = 22): DataFrame = {
    val z = mortonZ(quantize(lon, lonLo, lonHi, bits),
      quantize(lat, latLo, latHi, bits), bits)
    def micro(c: Column): Column = floor(c * lit(1000000.0)).cast("long")
    df.select(lon.as("_lon"), lat.as("_lat"),
        shiftright(z, bucketShift).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        micro(min("_lon")).as("min_lon_micro"),
        micro(max("_lon")).as("max_lon_micro"),
        micro(min("_lat")).as("min_lat_micro"),
        micro(max("_lat")).as("max_lat_micro"))
  }
}
