package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S11: per-truck-day annotation export (STEP 2.1.1,
  * `02.1.1_neural_net_training_ldevents_lsprep.py:172-303`): for each
  * device-day, one time-ordered 5-column CSV
  * (`timestamp,current_speed,load_weight,state,hash_id`, ISO timestamps
  * without zone suffix, nulls → 0.0/'unknown') plus one Label-Studio task
  * JSON carrying `data.{csv_url, truck_id, date}`.
  *
  * Spark-first: the CSV side is ONE partitioned write (each `device_date=`
  * directory holds exactly the reference's per-truck-day file content,
  * time-sorted via sortWithinPartitions); the task manifest is a tiny
  * one-row-per-day aggregate written as JSON — no driver-side loops over
  * telemetry.
  */
object LabelStudioExport {

  /** The reference's per-row CSV shape. */
  def annotationRows(silver: DataFrame): DataFrame =
    silver.select(
      col("device_id"), col("device_date"),
      date_format(col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .as("timestamp"),
      coalesce(col("current_speed"), lit(0.0)).as("current_speed"),
      coalesce(col("load_weight"), lit(0.0)).as("load_weight"),
      coalesce(col("state"), lit("unknown")).as("state"),
      col("raw_event_hash_id").as("hash_id"))

  /** Write the per-device-day CSVs (one directory per device_date). */
  def writeCsvs(silver: DataFrame, outDir: String): Unit =
    annotationRows(silver)
      .drop("device_id") // implied by the per-truck-day file, as in the ref
      .repartition(col("device_date"))
      .sortWithinPartitions("device_date", "timestamp")
      .write.mode("overwrite")
      .partitionBy("device_date")
      .option("header", "true")
      .csv(outDir)

  /** The task manifest: one row per device-day with the task JSON fields
    * (`data.csv_url/truck_id/date`), written as JSON lines. */
  def writeTaskManifest(silver: DataFrame, csvBaseUrl: String,
      outDir: String): Unit =
    silver
      .groupBy("device_id", "device_date")
      .agg(count(lit(1)).as("n_records"),
        date_format(min("timestamp"), "yyyy-MM-dd").as("date"))
      .select(struct(
        concat(lit(csvBaseUrl), lit("/device_date="), col("device_date"))
          .as("csv_url"),
        col("device_id").as("truck_id"),
        col("date"),
        col("n_records")).as("data"))
      .coalesce(1)
      .write.mode("overwrite").json(outDir)
}
