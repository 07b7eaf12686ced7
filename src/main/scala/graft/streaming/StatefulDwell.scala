package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming version of the gaps-and-islands dwell-time feature
  * (batch form: `FeatureEngineering.withWindowFeatures` W4+W7) via
  * `flatMapGroupsWithState` — per-device custom state tracking how long
  * the device has been continuously stationary.
  *
  * Emits one record per input event with the running dwell seconds,
  * resetting when the stationary flag flips — the same island semantics
  * as the batch window stack, but with O(1) state per device instead of a
  * partition-wide sort, which is what the semantics cost in a live
  * pipeline at fleet scale.
  */
object StatefulDwell {

  case class Ping(device_id: String, ts: Timestamp, is_stationary: Boolean)
  case class DwellState(blockStartUs: Long, lastUs: Long,
      stationary: Boolean, dwellS: Double)
  case class DwellOut(device_id: String, ts: Timestamp,
      is_stationary: Boolean, dwell_s: Double)

  def update(deviceId: String, pings: Iterator[Ping],
      state: GroupState[DwellState]): Iterator[DwellOut] = {
    var st = state.getOption.getOrElse(DwellState(0L, 0L, stationary = false, 0.0))
    val out = pings.toSeq.sortBy(_.ts.getTime).map { p =>
      val us = p.ts.getTime * 1000L
      val deltaS =
        if (st.lastUs == 0L) 0.0 else (us - st.lastUs) / 1e6
      // island entry starts at deltaS (the gap from the last moving ping),
      // matching the batch/reference island SUM(time_delta) which includes
      // the first stationary row's delta (04_worker_script.sql:63-66)
      val dwell =
        if (p.is_stationary && st.stationary) st.dwellS + deltaS
        else if (p.is_stationary) deltaS
        else 0.0
      st = DwellState(
        if (p.is_stationary && !st.stationary) us else st.blockStartUs,
        us, p.is_stationary, dwell)
      DwellOut(deviceId, p.ts, p.is_stationary, dwell)
    }
    state.update(st)
    out.iterator
  }

  /** Wire the stateful op over a (possibly streaming) Dataset[Ping]. */
  def dwellStream(pings: Dataset[Ping]): Dataset[DwellOut] = {
    import pings.sparkSession.implicits._
    pings.groupByKey(_.device_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
