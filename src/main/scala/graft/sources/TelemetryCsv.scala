package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.schema.Schemas

/** STEP 1 ingest source: the 4.7 GB telemetry CSV → bronze
  * (`STEP 1 - Ingest Raw Telemetry/01_ingest_raw_telemetry.py`).
  *
  * Reference behavior reproduced:
  *  - fail-fast header validation against the exact 11-column list
  *    (`:174-186`) — the header is probed with a tiny single-line read
  *    before launching the full scan;
  *  - empty fields → NULL (`:195-251` rewrites empty → `\N` for COPY);
  *  - permissive parsing: malformed rows carry through as nulls instead of
  *    aborting (PERMISSIVE mode), matching COPY's server-side coercion.
  *
  * The Python row-loop + COPY machinery disappears: `spark.read.csv` with a
  * declared schema is the whole ingest, parallel over file splits at any
  * scale. Write the result with `bronzeSink` (partitioned parquet) and the
  * 50k rows/s COPY baseline becomes a full-cluster-parallel scan.
  */
object TelemetryCsv {

  def validateHeader(spark: SparkSession, path: String): Unit = {
    val headerDf = spark.read
      .option("header", "false").option("inferSchema", "false")
      .csv(path).limit(1)
    val got = headerDf.head().toSeq.map(v => Option(v).map(_.toString.trim).getOrElse(""))
    val want = Schemas.rawCsvColumns
    require(got == want,
      s"CSV header mismatch:\n  got  $got\n  want $want")
  }

  /** Read the telemetry CSV with the bronze schema. */
  def read(spark: SparkSession, path: String,
      validate: Boolean = true): DataFrame = {
    if (validate) validateHeader(spark, path)
    spark.read
      .schema(Schemas.rawTelemetry)
      .option("header", "true")
      .option("nullValue", "")
      // RFC-4180 doubled-quote escaping (the reference CSVs carry quoted
      // JSON in `extras`)
      .option("escape", "\"")
      // Postgres renders the UTC offset as bare "+00" → pattern X (not XXX)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS][XXX][X]")
      .option("mode", "PERMISSIVE")
      .csv(path)
  }

  /** Bronze sink: parquet partitioned by ingest date — the COPY-into-table
    * equivalent (`S2`), snappy like the reference's export config
    * (`05_export_features_to_parquet.py:62-68`). */
  def bronzeSink(df: DataFrame, outDir: String): Unit = {
    import org.apache.spark.sql.functions._
    // cluster by the partition column before the dynamic-partition write:
    // without this every input task writes (and sorts for) every date —
    // tasks × dates small files. One exchange buys one file per date and
    // spares each task the partition-column sort. For dates too large for
    // one task, add a salt term to the repartition (more files per date).
    df.withColumn("ingest_date", to_date(col("timestamp")))
      .repartition(col("ingest_date"))
      .write.mode("append")
      .partitionBy("ingest_date")
      .option("compression", "snappy")
      .parquet(outDir)
  }
}
