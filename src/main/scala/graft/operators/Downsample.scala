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
}
