package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (point-in-range, per-key) joins — SURVEY §2.3 J2.
  *
  * Reference: labeling telemetry rows by membership in annotated
  * [start_time, end_time] intervals for the same truck, with label
  * precedence load_event > dump_event > background expressed as ordered
  * EXISTS subqueries
  * (`STEP 2.1 - LD Event Labeling/02.1.2_neural_net_training_ldevents_label_recombine.py:358-398`).
  *
  * Scale design: intervals are human-annotated and tiny relative to the
  * fact table, so they are pre-aggregated to ONE row per key
  * (`collect_list` of (start, end, rank) structs) and broadcast — the join
  * is then a plain broadcast *hash* join on the key (not even a nested
  * loop), and the range test + precedence pick run as codegen'd
  * higher-order array expressions per row. Zero shuffle of the fact side,
  * one output row per input row (EXISTS semantics — no duplicate explosion
  * on overlapping intervals, no regrouping).
  */
object IntervalJoin {

  /** Big-big interval join: when the interval side is too large to
    * broadcast, both sides are bucketized on a coarse time grain —
    * events map to one (key, grain) bucket each; an interval spanning g
    * grains replicates g times — and the range predicate applies after an
    * ordinary shuffled equi-join on (key, grain). Replication factor =
    * avg interval length / grain, so pick the grain near the typical
    * interval length. This is the standard relational range-join plan
    * (what a dedicated range-join strategy would synthesize).
    *
    * Output: one row per (event, matching interval) pair — join
    * multiplicity semantics, unlike [[labelByIntervals]]'s EXISTS shape.
    */
  def joinEventsToIntervals(events: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      grainSeconds: Long = 3600): DataFrame = {
    val evB = events.withColumn("_g",
      floor(unix_seconds(events(tsCol)) / grainSeconds))
    val ivB = intervals
      .withColumn("_g", explode(sequence(
        floor(unix_seconds(intervals(startCol)) / grainSeconds),
        floor(unix_seconds(intervals(endCol)) / grainSeconds))))
    evB.join(ivB,
        evB(keyCol) === ivB(keyCol) && evB("_g") === ivB("_g") &&
          evB(tsCol) >= ivB(startCol) && evB(tsCol) <= ivB(endCol))
      .drop(ivB(keyCol)).drop("_g")
  }

  /** Label each event row with the highest-precedence matching interval
    * label, default `defaultLabel`.
    *
    * @param events     fact rows carrying `keyCol` and `tsCol`
    * @param intervals  small frame: keyCol, startCol, endCol, labelCol
    * @param precedence labels in priority order (first wins on overlap);
    *                   interval rows with labels outside this list are
    *                   ignored
    */
  def labelByIntervals(events: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      labelCol: String, precedence: Seq[String],
      defaultLabel: String = "background",
      outCol: String = "ml_event_label"): DataFrame = {
    val rankCol = precedence.zipWithIndex.foldLeft(
      lit(null).cast("int")) { case (acc, (l, r)) =>
      when(intervals(labelCol) === l, r).otherwise(acc)
    }
    val perKey = intervals
      .select(intervals(keyCol).as("_ik"),
        struct(
          intervals(startCol).as("s"),
          intervals(endCol).as("e"),
          rankCol.as("r")).as("_iv"))
      .where(col("_iv.r").isNotNull)
      .groupBy("_ik")
      .agg(collect_list("_iv").as("_ivs"))

    val ts = events(tsCol)
    val matched = filter(col("_ivs"),
      iv => ts >= iv.getField("s") && ts <= iv.getField("e"))
    val bestRank = array_min(transform(matched, _.getField("r")))
    val lblExpr = precedence.zipWithIndex.foldLeft(lit(defaultLabel)) {
      case (acc, (l, r)) => when(bestRank === r, l).otherwise(acc)
    }
    events
      .join(broadcast(perKey), events(keyCol) === col("_ik"), "left")
      .withColumn(outCol, when(col("_ivs").isNull, defaultLabel)
        .otherwise(lblExpr))
      .drop("_ik", "_ivs")
  }

  /** As-of join: attach to each left row the payload of the LATEST right
    * row with `right.ts <= left.ts` on the same key (DuckDB/kdb ASOF LEFT
    * JOIN semantics; ties at equal timestamps match).
    *
    * Implemented as union + carry-forward window — the big-big scale
    * path: ONE shuffle on the key, no broadcast requirement, no range
    * replication. Right rows sort before left rows at the same timestamp
    * (side tag) and carry their payload as ONE struct, so (a) a prior
    * right row whose payload VALUES are null still wins (no
    * skip-the-null-row drift from per-column carry), (b) multi-column
    * payloads are never torn across different right rows, and (c) right
    * rows duplicated on (key, ts) resolve deterministically (greatest
    * payload tuple). At 100 TB both sides stream through a single hash
    * partitioning; state per task is one carried struct per key.
    *
    * @param payload right-side columns to attach (null when no prior row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    val plType = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
    val l = left
      .withColumn("_ats", col(leftTs))
      .withColumn("_side", lit(1))
      .select(Seq(col(keyCol).as("_ak"), col("_ats"), col("_side"),
        lit(null).cast(plType).as("_pl")) ++ leftCols.map(col): _*)
    val r = right
      .withColumn("_ats", col(rightTs))
      .withColumn("_side", lit(0))
      .select(Seq(col(keyCol).as("_ak"), col("_ats"), col("_side"),
        struct(payload.map(col): _*).as("_pl")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val w = Window.partitionBy("_ak").orderBy("_ats", "_side", "_pl")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_carried", last(col("_pl"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col(s"_carried.$c").as(c)): _*)
  }
}
