package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STEP 2.1 Label-Studio annotation source (S10): `labels_*.json` task
  * exports → flat (truck_id, date, start_time, end_time, label) interval
  * rows (`02.1.2_neural_net_training_ldevents_label_recombine.py:173-274`).
  *
  * Reference semantics reproduced:
  *  - task → annotations[] → result[] nested explode;
  *  - only `type = 'timeserieslabels'` results with both start and end;
  *  - first label of the `timeserieslabels` array wins;
  *  - truck_id from `data.truck_id`; date from `data.date`, else derived
  *    from the start timestamp's date;
  *  - tasks without truck_id are dropped (the reference logs + skips).
  *
  * `multiLine` JSON + two explodes — a single declarative plan; the file
  * glob (`labels_*.json`) is pushed to the reader.
  */
object LabelStudioJson {

  def read(spark: SparkSession, globPath: String): DataFrame = {
    val raw = spark.read.option("multiLine", "true").json(globPath)
    raw
      .select(col("id").as("task_id"), col("data"),
        explode(col("annotations")).as("ann"))
      .select(col("task_id"), col("data"), col("ann.id").as("annotation_id"),
        explode(col("ann.result")).as("res"))
      .where(col("res.type") === "timeserieslabels" &&
        col("res.value.start").isNotNull && col("res.value.end").isNotNull &&
        size(col("res.value.timeserieslabels")) > 0)
      .select(
        col("data.truck_id").as("truck_id"),
        coalesce(col("data.date"),
          date_format(to_timestamp(col("res.value.start")), "yyyy-MM-dd"))
          .as("date"),
        to_timestamp(col("res.value.start")).as("start_time"),
        to_timestamp(col("res.value.end")).as("end_time"),
        col("res.value.timeserieslabels").getItem(0).as("label"),
        col("task_id"), col("annotation_id"))
      .where(col("truck_id").isNotNull)
  }
}
