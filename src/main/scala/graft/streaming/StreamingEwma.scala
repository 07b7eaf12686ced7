package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch EWMA fold
  * ([[graft.operators.Downsample.ewmaQuantized]]) via
  * `flatMapGroupsWithState`: the recurrence eₜ = (num·xₜ +
  * (den−num)·eₜ₋₁) div den needs exactly ONE long of state per
  * series — the structurally-bounded-state property every operator in
  * this package maintains — versus the batch form's per-group gather.
  *
  * Same exact integer arithmetic as the batch fold (truncating
  * division; see the batch scaladoc for the DuckDB `//` parity note),
  * so replaying a day's events through the stream and running the
  * batch operator produce IDENTICAL rows — StreamingEwmaSpec pins the
  * equality. Events inside one micro-batch are sorted by (ord, id);
  * cross-batch order is the stream's arrival order, exactly like the
  * batch op's (orderCols, id) sort within its gathered group.
  */
object StreamingEwma {

  case class Obs(series: String, ord: Long, id: Long, x_m: Long)
  case class EwmaState(e: Long, seen: Boolean)
  case class EwmaOut(series: String, id: Long, x_m: Long, ewma_m: Long)

  val Num = 2L
  val Den = 10L

  def update(series: String, obs: Iterator[Obs],
      state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    var st = state.getOption.getOrElse(EwmaState(0L, seen = false))
    val out = obs.toSeq.sortBy(o => (o.ord, o.id)).map { o =>
      val s = Num * o.x_m + (Den - Num) * st.e
      val e2 = if (!st.seen) o.x_m else (s - s % Den) / Den
      st = EwmaState(e2, seen = true)
      EwmaOut(series, o.id, o.x_m, e2)
    }
    state.update(st)
    out.iterator
  }

  /** Wire the stateful op over a (possibly streaming) Dataset[Obs]. */
  def ewmaStream(obs: Dataset[Obs]): Dataset[EwmaOut] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.series)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
