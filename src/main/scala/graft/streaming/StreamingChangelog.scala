package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the CDC changelog apply
  * ([[graft.operators.TelemetryTransform.applyChangelog]]): maintain
  * the last-writer-wins materialized row per key as a live stream
  * instead of a batch replay. State = ONE (seq, op, payload) per key —
  * the structurally-bounded contract of this package — and unlike the
  * funnel/Markov twins this one needs NO arrival-order contract at
  * all: the winner is decided by the log's own sequence number, so any
  * interleaving across micro-batches converges to the same view
  * (StreamingChangelogSpec feeds a shuffled log and pins equality with
  * the batch operator). Deletes tombstone: the reader drops rows whose
  * latest op is 'D'. */
object StreamingChangelog {

  case class LogOp(k: Long, seq: Long, op: String, v: Long)
  case class KeyState(seq: Long, op: String, v: Long)
  /** Current materialized row for a key after each micro-batch it
    * appeared in — the reader's view is the max-seq row per key. */
  case class CurrentRow(k: Long, seq: Long, op: String, v: Long)

  def update(k: Long, ops: Iterator[LogOp],
      state: GroupState[KeyState]): Iterator[CurrentRow] = {
    var st = state.getOption.getOrElse(KeyState(Long.MinValue, "", 0L))
    ops.foreach { o =>
      require(o.op == "U" || o.op == "D",
        s"changelog op must be 'U' or 'D', got '${o.op}'")
      if (o.seq > st.seq) st = KeyState(o.seq, o.op, o.v)
    }
    state.update(st)
    Iterator(CurrentRow(k, st.seq, st.op, st.v))
  }

  def stream(ops: Dataset[LogOp]): Dataset[CurrentRow] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
