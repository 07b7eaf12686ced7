package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TelemetryTransform
import graft.schema.Schemas

/** Structured Streaming ingest: the optional streaming twin of STEP 1+2
  * (SURVEY §2.9 — the reference is batch-only; its idempotent hash-keyed
  * incremental append maps directly onto a streaming dedup).
  *
  * file source (CSV drop directory) → the SAME silver transform as batch
  * (`TelemetryTransform.transform` is a pure column expression, shared
  * verbatim) → watermarked exactly-once dedup on the row hash →
  * sink. `dropDuplicatesWithinWatermark` keeps the dedup state bounded —
  * the streaming equivalent of the reference's `NOT EXISTS` anti-join
  * (`02_raw_telemetry_transform.py:374-378`).
  */
object StreamingIngest {

  /** Streaming bronze → silver with bounded-state dedup. */
  def silverStream(spark: SparkSession, csvDir: String,
      watermark: String = "10 minutes"): DataFrame = {
    val raw = spark.readStream
      .schema(Schemas.rawTelemetry)
      .option("header", "true")
      .option("nullValue", "")
      .option("escape", "\"")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS][XXX][X]")
      .csv(csvDir)
    TelemetryTransform.transform(raw)
      .withWatermark("timestamp", watermark)
      .dropDuplicatesWithinWatermark("raw_event_hash_id")
  }

  /** Streaming 5 s tumbling mean — the A6 downsample as a live query
    * (append mode after watermark closes each bucket).
    *
    * Composability: if the input already carries an event-time watermark
    * (e.g. it came from [[silverStream]], whose dedup defines one), that
    * watermark is inherited — Spark disallows redefining it across
    * chained stateful operators. `watermark` only applies to raw inputs.
    */
  def downsampleStream(silver: DataFrame, every: String = "5 seconds",
      watermark: String = "30 seconds"): DataFrame = {
    // inherit only a watermark defined on OUR event-time column — a
    // watermark on some other column would leave the window agg without
    // one on 'timestamp' (AnalysisException / never-finalizing buckets)
    val alreadyWatermarked = silver.queryExecution.logical.collectFirst {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark
          if e.eventTime.name == "timestamp" => e
    }.isDefined
    val src = if (alreadyWatermarked) silver
      else silver.withWatermark("timestamp", watermark)
    src
      .groupBy(col("device_date"), window(col("timestamp"), every))
      .agg(avg("current_speed").as("speed_mean"),
        count(lit(1)).as("n"))
      .select(col("device_date"), col("window.start").as("bucket_start"),
        col("speed_mean"), col("n"))
  }
}
