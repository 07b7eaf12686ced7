package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tumbling time-bucket aggregation (SURVEY §2.4 A6) — the reference's
  * `group_by_dynamic(every=5s, period=5s, closed="left")` downsampling
  * (`05_cpd_orchestrator_polars.py:263-276,346-360`).
  *
  * `window(ts, every)` is epoch-aligned and closed-left, matching polars'
  * tumbling semantics here. "first value in bucket" is expressed as
  * `min_by(c, ts)` — Spark's `first()` in a groupBy is order-undefined, so
  * the deterministic earliest-row pick must be explicit.
  *
  * Streaming note: the identical expression works under Structured
  * Streaming with a watermark on `ts` — this operator is the batch/stream
  * shared core.
  */
object Downsample {

  /** Bucket `df` into tumbling windows of `every` per `keys`, computing
    * `avg` of each signal column and the earliest row's value for each
    * `firstCols` column. Output: keys ++ bucket_start ++ means ++ firsts. */
  def tumblingMean(df: DataFrame, ts: String, every: String,
      keys: Seq[String], signals: Seq[String],
      firstCols: Seq[String] = Nil): DataFrame = {
    val aggs: Seq[Column] =
      signals.map(c => avg(col(c)).as(c)) ++
        firstCols.map(c => min_by(col(c), col(ts)).as(c))
    df.groupBy((keys.map(col) :+ window(col(ts), every).as("_w")): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_start", col("_w.start"))
      .drop("_w")
  }

  /** Exponentially-weighted moving average per group, in EXACT integer
    * arithmetic — the streaming-friendly smoothing twin of the
    * Savitzky-Golay kernel (one value of state per series vs a
    * 21-point window), and the recursive-operator pattern: eₜ =
    * (num·xₜ + (den−num)·eₜ₋₁) div den on quantized milli-units, e₁ =
    * x₁. A float EWMA accumulates rounding in evaluation order; the
    * integer recurrence is bit-reproducible on any engine, so the
    * DuckDB oracle can replay it row-for-row with a recursive CTE
    * marching each group in rank lockstep.
    *
    * Plan shape: recursive state cannot ride a window function, so
    * each group's rows are gathered once (sort_array ∘ collect_list,
    * ONE keyed shuffle), folded by a single `aggregate` HOF, and
    * re-exploded. Per-task state is one group's row array — bounded by
    * the (device, day) grain exactly like the PELT kernel's
    * device-day buckets; a deployment smoothing unbounded series keys
    * the group by (series, day) and chains e₀ across days.
    *
    * Integer division: `(s − s % den) / den` keeps the whole fold in
    * codegen-friendly long arithmetic ((long − long) / long is exact
    * for these magnitudes). Both sides TRUNCATE toward zero — Spark's
    * `%` carries the dividend's sign, and DuckDB's `//` is verified
    * truncating as well (−15 // 10 = −1, not −2) — so the recurrence
    * agrees for negative inputs too (DownsampleSpec pins a negative
    * series).
    *
    * Overflow bound (KernelProperties): the fold never amplifies —
    * |eₜ| ≤ max|x| by induction — so the intermediate num·x+(den−num)·e
    * is wrap-free whenever |x_milli| ≤ Long.Max/den (9.2·10^17 at
    * den=10; any physical milli-quantized signal is ~12 orders inside). */
  def ewmaQuantized(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[String], idCol: String, xMilli: Column,
      num: Long = 2L, den: Long = 10L): DataFrame = {
    require(num > 0 && num < den, s"alpha must satisfy 0 < $num/$den < 1")
    val outT = "array<struct<id:bigint,x_m:bigint,ewma_m:bigint>>"
    val fold = aggregate(
      col("_items"),
      struct(lit(0L).as("e"), lit(null).cast(outT).as("out")),
      (st, it) => {
        val x = it.getField("x_m")
        val prev = st.getField("e")
        val s = lit(num) * x + lit(den - num) * prev
        val e2 = when(st.getField("out").isNull, x)
          .otherwise(((s - s % lit(den)) / lit(den)).cast("long"))
        struct(e2.as("e"),
          concat(coalesce(st.getField("out"), array().cast(outT)),
            array(struct(it.getField("id").as("id"), x.as("x_m"),
              e2.as("ewma_m")))).as("out"))
      },
      st => st.getField("out"))
    df.select(groupCols.map(col) ++ Seq(
        struct(orderCols.map(col) :+ col(idCol).as("id") :+
          xMilli.as("x_m"): _*).as("_it")): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_list(col("_it"))).as("_items"))
      .select(groupCols.map(col) :+ explode(fold).as("_r"): _*)
      .select(groupCols.map(col) ++ Seq(col("_r.id").as(idCol),
        col("_r.x_m").as("x_m"), col("_r.ewma_m").as("ewma_m")): _*)
  }

  /** Gap filling — the inverse of downsampling: regularize an irregular
    * per-key series onto a fixed `stepUs` grid spanning each key's own
    * [min, max] extent, carrying the last non-null value forward into
    * empty buckets (`is_filled` marks synthesized values — including the
    * LOCF substitution for a present-but-NULL observation, the standard
    * last-observation-carried-forward semantic).
    *
    * Contract: rows with a NULL key are dropped (a regularized series
    * needs an identity; the null-rejecting grid join would silently
    * blank their values otherwise). Dedupe keeps the latest row per
    * (key, bucket); `tieBreak` columns refine ties on the timestamp, and
    * the value itself is the final tiebreak, so output values are
    * deterministic under any partitioning. `maxBucketsPerKey` fails fast
    * (with the offending key) instead of letting one corrupt outlier
    * timestamp explode a key's grid into a single giant task.
    *
    * Plan: the dedupe's rank-1 filter is recognized by Spark's
    * WindowGroupLimit rule, which prunes to per-partition bucket winners
    * BEFORE the keyed exchange — so even the dedupe shuffle carries
    * ~bucket-density rows, and every later stage (extent agg, grid
    * `sequence`+`explode`, grid⋈actuals join, forward-fill window) runs
    * at post-bucketing density. No driver collection; carried values are
    * copied bits. */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepUs: Long,
      tieBreak: Seq[String] = Nil,
      maxBucketsPerKey: Long = 10000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = df
      .where(col(keyCol).isNotNull)
      .withColumn("_bucket",
        floor(unix_micros(col(tsCol)) / stepUs).cast("long"))
    val ordered = Window.partitionBy(keyCol, "_bucket")
      .orderBy((col(tsCol).desc +: tieBreak.map(col(_).desc)) :+
        col(valueCol).desc: _*)
    val actual = bucketed
      .withColumn("_rn", row_number().over(ordered))
      .where(col("_rn") === 1)
      .select(col(keyCol), col("_bucket"), col(valueCol))
    val extent = actual.groupBy(keyCol)
      .agg(min("_bucket").as("_lo"), max("_bucket").as("_hi"))
    val grid = extent.select(col(keyCol),
        when(col("_hi") - col("_lo") >= maxBucketsPerKey,
          raise_error(concat(lit("gapFill: key "),
            coalesce(col(keyCol).cast("string"), lit("null")),
            lit(s" spans more than $maxBucketsPerKey buckets — corrupt " +
              "timestamp or too-fine step"))))
          .otherwise(col("_lo")).as("_lo"),
        col("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"))).as("_bucket"))
    val fillW = Window.partitionBy(keyCol).orderBy("_bucket")
    grid.join(actual, Seq(keyCol, "_bucket"), "left")
      .withColumn("is_filled", col(valueCol).isNull)
      .withColumn(valueCol,
        last(col(valueCol), ignoreNulls = true).over(fillW))
      .withColumn("bucket_start_us", col("_bucket") * stepUs)
      .select(col(keyCol), col("bucket_start_us"), col(valueCol),
        col("is_filled"))
  }
}
