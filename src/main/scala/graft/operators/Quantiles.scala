package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable histogram quantiles — the 100 TB path beside the exact
  * `percentile` used by q_percentiles/q_winsorize: an exact percentile
  * needs each group's full value multiset in one place (Spark gathers
  * and sorts it), while a fixed-grid histogram is ONE map-side-combined
  * aggregation whose state is the grid size, merges across shards /
  * days / streaming micro-batches by plain addition (the HLL-register
  * discipline applied to quantiles), and answers any quantile after
  * the fact.
  *
  * Definition (engine-exact, integer-only): values quantize to
  * `bucket = floor(v · scale)`; quantile q = num/den is the NEAREST-
  * RANK bucket — the smallest bucket whose cumulative count reaches
  * `ceil(q·N) = (N·num + den − 1) div den` — reported in bucket units
  * (milli by default). The answer differs from the true nearest-rank
  * value by at most one grid step; the DuckDB oracle replays it
  * bit-for-bit (no interpolation, no floats past the quantize).
  *
  * Plan shape: narrow quantize → two-phase (keys, bucket) count agg →
  * per-key cumulative window ORDERED BY BUCKET (frame bounded by the
  * grid cardinality, not the row count) → one agg row per key. The
  * histogram frame is also the merge surface: union shard histograms,
  * re-`sum(n)` per (keys, bucket), and feed [[quantilesFromHistogram]].
  */
object Quantiles {

  /** Per-(keys, bucket) counts: the sufficient statistic. NULL values
    * are dropped, matching `percentile`'s semantics — counted, a NULL
    * bucket would also sort NULLS FIRST in Spark's cumulative window
    * but NULLS LAST in DuckDB's, silently shifting every rank (r11
    * review finding). */
  def histogram(df: DataFrame, keyCols: Seq[String], value: Column,
      scale: Long = 1000L): DataFrame =
    df.where(value.isNotNull)
      .select(keyCols.map(col) :+
        floor(value * scale).cast("long").as("bucket"): _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))

  /** Nearest-rank quantiles from a histogram frame (`keys, bucket, n`).
    * `quantiles` = (outputColumn, num, den) with 0 < num ≤ den. */
  def quantilesFromHistogram(hist: DataFrame, keyCols: Seq[String],
      quantiles: Seq[(String, Long, Long)]): DataFrame = {
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (c, num, den) =>
      require(num > 0 && num <= den, s"quantile $c: need 0 < $num <= $den")
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy("bucket")
    // per-key total as a partition window, NOT an agg + self-join: the
    // frame is grid-cardinality-bounded anyway, the plan loses a join,
    // and a histogram read back from a view/memory sink would trip
    // Spark's conflicting-reference check in the self-join form
    val cum = hist
      .withColumn("_cum", sum("n").over(w))
      .withColumn("_total",
        sum("n").over(Window.partitionBy(keyCols.map(col): _*)))
    val aggs = quantiles.map { case (label, num, den) =>
      min(when(col("_cum") >=
        expr(s"(_total * $num + ${den - 1}) div $den"), col("bucket")))
        .as(label)
    }
    cum.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** One-shot: histogram + quantiles. Output: keys ++ one long column
    * per requested quantile, in `1/scale` units. */
  def histogramQuantiles(df: DataFrame, keyCols: Seq[String],
      value: Column, scale: Long = 1000L,
      quantiles: Seq[(String, Long, Long)]): DataFrame =
    quantilesFromHistogram(histogram(df, keyCols, value, scale), keyCols,
      quantiles)
}
