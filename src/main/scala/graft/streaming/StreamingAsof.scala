package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.IntervalJoin.asofJoin]]: enrich an
  * event stream with the latest at-or-before state per key, carrying one
  * state row per key in `flatMapGroupsWithState` — O(1) state, no
  * watermark-bounded buffering of the event side.
  *
  * Semantics: within a micro-batch, rows replay in (ts, side) order —
  * state updates at a timestamp are visible to events at the same
  * timestamp (the batch as-of tie rule); across batches the carried state
  * persists. Late state updates older than the carried one are ignored
  * (the carried state is always the max-ts seen), so out-of-order state
  * delivery degrades to at-or-before-of-what-arrived — the usual streaming
  * relaxation of the batch operator.
  */
object StreamingAsof {

  /** side 0 = state update (payload set); side 1 = event to enrich. */
  case class Tick(key: String, ts: Timestamp, side: Int, payload: String)

  case class Enriched(key: String, ts: Timestamp, payload: Option[String])

  case class Carried(tsMillis: Long, payload: String)

  def update(key: String, rows: Iterator[Tick],
      state: GroupState[Carried]): Iterator[Enriched] = {
    var carried = state.getOption
    val out = rows.toSeq.sortBy(t => (t.ts.getTime, t.side)).flatMap { t =>
      if (t.side == 0) {
        if (carried.forall(_.tsMillis <= t.ts.getTime))
          carried = Some(Carried(t.ts.getTime, t.payload))
        None
      } else {
        Some(Enriched(key, t.ts, carried.map(_.payload)))
      }
    }
    carried.foreach(state.update)
    out.iterator
  }

  def enrich(ticks: Dataset[Tick]): Dataset[Enriched] = {
    import ticks.sparkSession.implicits._
    ticks.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
