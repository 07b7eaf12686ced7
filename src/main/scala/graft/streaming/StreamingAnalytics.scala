package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the batch analytics family (q_funnel,
  * q_retention, q_markov, q_psi_drift, q_ks_drift) — the
  * [[StreamingEwma]] pattern applied to product analytics: each
  * per-key state is STRUCTURALLY bounded (a fixed struct of longs, not
  * a growing collection), and replaying a day's events through the
  * stream equals the batch query exactly (StreamingAnalyticsSpec pins
  * equality across interleaved micro-batch splits).
  *
  * Ordering contract (same as [[StreamingEwma]]): events inside one
  * micro-batch are sorted by (ts, id); cross-batch order is arrival
  * order — the stream must deliver each key's events in event-time
  * order across batches, which is what a watermarked, source-ordered
  * deployment provides. Under that contract the incremental
  * transitions below reproduce the batch min-chains exactly.
  *
  * PSI/KS take the other twin shape — the sketch-snapshot pattern of
  * [[StreamingHll]]: their sufficient statistic is a keyed COUNT table
  * (10 fixed buckets per type for PSI; the quantization grid for KS),
  * so the twin is a built-in streaming aggregation whose snapshot
  * equals the batch count table bit-for-bit; the drift stat is the
  * same deterministic expression over either. No custom state needed —
  * Spark's own agg state store IS the bounded state.
  */
object StreamingAnalytics {

  // ---- ordered funnel (batch twin: q_funnel's view → later click →
  // later purchase min-chain) ----

  case class FunnelEvt(user: Long, day: String, etype: String, ts: Long,
      id: Long)
  /** Three optional micros + nothing else: the whole per-(user, day)
    * state. Fields are set at most once and only forward in time.
    * Unset is Long.MinValue — a `< 0` sentinel would mis-handle
    * legitimately negative event-time micros (pre-1970 or corrupt
    * telemetry), the RetentionState lesson applied here too (r11
    * review). */
  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long) {
    def defined: Int =
      Seq(tView, tClick, tPurchase).count(_ != Long.MinValue)
  }
  case class FunnelRow(user: Long, day: String, nDefined: Int,
      tView: Long, tClick: Long, tPurchase: Long)

  def funnelUpdate(key: (Long, String), evts: Iterator[FunnelEvt],
      state: GroupState[FunnelState]): Iterator[FunnelRow] = {
    val unset = Long.MinValue
    val firstSeen = state.getOption.isEmpty
    var st = state.getOption.getOrElse(FunnelState(unset, unset, unset))
    val before = st
    evts.toSeq.sortBy(e => (e.ts, e.id)).foreach { e =>
      e.etype match {
        case "view" if st.tView == unset => st = st.copy(tView = e.ts)
        case "click" if st.tView != unset && e.ts > st.tView &&
            st.tClick == unset =>
          st = st.copy(tClick = e.ts)
        case "purchase" if st.tClick != unset && e.ts > st.tClick &&
            st.tPurchase == unset => st = st.copy(tPurchase = e.ts)
        case _ => ()
      }
    }
    state.update(st)
    // append-mode: emit a snapshot when the key is first seen (batch
    // g1 counts every active (user, day), funnel or not) or when the
    // stage chain advanced; state growth is monotone, so the reader's
    // final row per key is the one with the max nDefined
    if (st != before || firstSeen)
      Iterator(FunnelRow(key._1, key._2, st.defined,
        st.tView, st.tClick, st.tPurchase))
    else Iterator.empty
  }

  def funnelStream(evts: Dataset[FunnelEvt]): Dataset[FunnelRow] = {
    import evts.sparkSession.implicits._
    evts.groupByKey(e => (e.user, e.day))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(funnelUpdate)
  }

  // ---- weekly retention (batch twin: q_retention's cohort = first
  // active week, cell = distinct users active k weeks later) ----

  case class WeekEvt(user: Long, week: Long, id: Long)
  /** Two longs: cohort (first week, fixed once) + last week emitted.
    * In event-time order weeks arrive non-decreasing, so "week >
    * lastWeek" detects every NEW distinct week without a set. Unset is
    * Long.MinValue, NOT a negative sentinel — week numbers are floor
    * division from an anchor date and are legitimately negative for
    * pre-anchor events (the q_retention oracle-parity case), so a
    * `< 0` check would re-seed the cohort on every event (r11 review
    * finding). */
  case class RetentionState(cohortWeek: Long, lastWeek: Long)
  case class RetentionRow(user: Long, cohortWeek: Long, weekOffset: Long)

  def retentionUpdate(user: Long, evts: Iterator[WeekEvt],
      state: GroupState[RetentionState]): Iterator[RetentionRow] = {
    var st = state.getOption.getOrElse(
      RetentionState(Long.MinValue, Long.MinValue))
    val out = scala.collection.mutable.ListBuffer.empty[RetentionRow]
    evts.toSeq.sortBy(e => (e.week, e.id)).foreach { e =>
      if (st.cohortWeek == Long.MinValue)
        st = RetentionState(e.week, Long.MinValue)
      if (e.week > st.lastWeek) {
        out += RetentionRow(user, st.cohortWeek, e.week - st.cohortWeek)
        st = st.copy(lastWeek = e.week)
      }
    }
    state.update(st)
    out.iterator
  }

  def retentionStream(evts: Dataset[WeekEvt]): Dataset[RetentionRow] = {
    import evts.sparkSession.implicits._
    evts.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(retentionUpdate)
  }

  // ---- event-sequence Markov transitions (batch twin: q_markov's
  // per-user lag over (ts, event_id) order) ----

  case class SeqEvt(user: Long, ts: Long, id: Long, etype: String)
  /** One string of state: the previous event type. */
  case class MarkovState(prev: String)
  case class TransitionRow(prev: String, cur: String)

  def markovUpdate(user: Long, evts: Iterator[SeqEvt],
      state: GroupState[MarkovState]): Iterator[TransitionRow] = {
    var prev = state.getOption.map(_.prev).orNull
    val out = scala.collection.mutable.ListBuffer.empty[TransitionRow]
    evts.toSeq.sortBy(e => (e.ts, e.id)).foreach { e =>
      if (prev != null) out += TransitionRow(prev, e.etype)
      prev = e.etype
    }
    if (prev != null) state.update(MarkovState(prev))
    out.iterator
  }

  def markovStream(evts: Dataset[SeqEvt]): Dataset[TransitionRow] = {
    import evts.sparkSession.implicits._
    evts.groupByKey(_.user)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(markovUpdate)
  }

  // ---- PSI / KS drift: sufficient-statistic streams ----

  /** PSI count table as a streaming aggregation: (event_type, bk) →
    * (ca, cb). Input rows carry the SAME derivations as the batch
    * query (bk = clamp(floor(value/50), 0..9); is_a = ts ≤ split).
    * State: ≤ 10 buckets × |types| rows in the agg store — fixed.
    * Run with outputMode(Complete) to a memory sink; the final snapshot
    * equals the batch count table exactly, and q_psi_drift's grid +
    * nano-ln expression over it reproduces the batch stat bit-for-bit. */
  def psiCounts(evts: DataFrame): DataFrame =
    evts.groupBy(col("event_type"), col("bk"))
      .agg(sum("is_a").as("ca"), sum(expr("1 - is_a")).as("cb"))

  /** KS count table: (event_type, x_milli) → per-side counts. State is
    * bounded by the quantization grid (milli-quantized value domain),
    * the same cardinality the batch agg shuffles. */
  def ksCounts(evts: DataFrame): DataFrame =
    evts.groupBy(col("event_type"), col("x_milli"))
      .agg(sum("is_a").as("ca"), sum(expr("1 - is_a")).as("cb"))

  // ---- GRPO / ranking-metrics: the same sufficient-statistic twin
  // shape (r12 verdict stretch item) ----

  /** GRPO group statistics as a streaming aggregation: grp →
    * (n, s1, s2) — exactly the three aggregates
    * [[graft.operators.DataPrep.groupAdvantages]] computes off its
    * keyed window, accumulated incrementally as rollout batches land.
    * Input rows carry (grp, x) with the score already cast long and
    * null scores filtered upstream (the batch operator's own
    * contract). State: one 3-long row per group in the agg store —
    * bounded by group count, not rollouts. Run Complete to a
    * snapshot; any row's advantage replays as the identical closed
    * form floor((n·x − s1)·10⁶ / sqrt(n·s2 − s1²)) (0 on zero
    * variance) — StreamingAnalyticsSpec pins batch equality across
    * interleaved micro-batches. */
  def grpoStats(scores: DataFrame): DataFrame =
    scores.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"))

  /** Ranking-metrics hit table as a streaming aggregation:
    * (query_id, id) → best rank — the result-side best-rank dedup of
    * [[graft.operators.Relevance.rankingMetrics]] as incremental
    * state, for rankings that arrive as retrieval batches (`truth` is
    * a static dimension; stream–static inner join per micro-batch).
    * Out-of-window ranks are FILTERED here, not raised — a streaming
    * job cannot usefully fail a row mid-flight; feed the snapshot
    * back through the batch operator (which re-guards) for metrics.
    * State: ≤ one row per (query, relevant candidate), k-bounded per
    * query per ranking source. Because the snapshot is itself a valid
    * (already-deduped) results frame, `rankingMetrics(snapshot,
    * truth, ...)` equals the batch metrics over the full stream. */
  def rankingHits(results: DataFrame, truth: DataFrame,
      k: Int): DataFrame =
    results.where(col("rank").between(1, k))
      .join(truth.select(col("query_id"), col("id")),
        Seq("query_id", "id"))
      .groupBy(col("query_id"), col("id"))
      .agg(min(col("rank")).as("rank"))
}
