package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequent-item detection at stream/corpus scale: a Misra-Gries summary
  * (Misra & Gries 1982, "Finding repeated elements") as a typed, MERGEABLE
  * Spark [[Aggregator]] — the custom-aggregate tier of the extension
  * ladder. The sketch over-approximates: every item with true frequency
  * > n/capacity is guaranteed present in the summary (and spurious items
  * may be), so the standard two-phase plan is exact:
  *
  *  1. sketch pass: one map-side-combining aggregation → ≤ capacity
  *     candidate keys (constant state per partition, mergeable across
  *     partitions — this is what makes it work on 100 TB);
  *  2. verify pass: exact counts of the candidates only (a filtered
  *     aggregation over a tiny key set), thresholded at the requested
  *     support.
  *
  * The guarantee needs capacity > 1/support; [[topFrequent]] enforces it.
  * Note the sketch pass runs EAGERLY at call time (the driver needs the
  * candidate set to build the verify plan) — two jobs total, with the
  * exact row count carried inside the sketch buffer.
  */
object HeavyHitters {

  /** Product-encodable sketch buffer (parallel key/count arrays — a
    * Map-typed buffer needs a kryo encoder the udaf() path rejects). */
  case class MGBuf(keys: Seq[String], counts: Seq[Long], rows: Long) {
    def toMap: Map[String, Long] = keys.zip(counts).toMap
  }
  // buffer order is irrelevant (finish() sorts); sorting here would cost
  // O(capacity log capacity) per input ROW on the aggregation hot path
  private def fromMap(m: Map[String, Long], rows: Long): MGBuf =
    MGBuf(m.keys.toSeq, m.values.toSeq, rows)

  /** Misra-Gries summary aggregator. Buffer = key → residual count;
    * `reduce` is the classic decrement-all-on-overflow step, `merge` adds
    * summaries then re-truncates by subtracting the (capacity)-th largest
    * residual (Agarwal et al. 2013 mergeable-summaries construction). */
  case class MisraGries(capacity: Int)
      extends Aggregator[String, MGBuf, MGBuf] {
    require(capacity >= 2, "capacity must be >= 2")

    def zero: MGBuf = MGBuf(Nil, Nil, 0L)

    def reduce(buf: MGBuf, key: String): MGBuf = {
      if (key == null) return buf.copy(rows = buf.rows + 1)
      val b = buf.toMap
      fromMap(b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < capacity - 1 => b.updated(key, 1L)
        case None =>
          // decrement every counter; drop the zeroed ones
          b.flatMap { case (k, c) => if (c > 1) Some(k -> (c - 1)) else None }
      }, buf.rows + 1)
    }

    def merge(b1: MGBuf, b2: MGBuf): MGBuf = {
      val sum = b2.toMap.foldLeft(b1.toMap) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      fromMap(
        if (sum.size < capacity) sum
        else {
          val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)
            .apply(capacity - 1)
          sum.flatMap { case (k, c) =>
            if (c > cut) Some(k -> (c - cut)) else None
          }
        }, b1.rows + b2.rows)
    }

    // summary out: sorted keys (determinism) + the exact total row count
    // accumulated alongside the sketch (saves the separate count() pass)
    def finish(b: MGBuf): MGBuf = {
      val ks = b.keys.sorted
      val m = b.toMap
      MGBuf(ks, ks.map(m), b.rows)
    }

    def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
    def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  }

  /** One sketch pass: (candidate keys ≤ capacity, exact total rows). */
  def sketch(df: DataFrame, keyCol: String,
      capacity: Int): (Seq[String], Long) = {
    val agg = udaf(MisraGries(capacity))
    val s = df.select(agg(col(keyCol)).as("s")).head()
      .getStruct(0)
    (s.getSeq[String](0), s.getLong(2))
  }

  /** Candidate keys from one sketch pass (≤ capacity of them). */
  def sketchCandidates(df: DataFrame, keyCol: String,
      capacity: Int): Seq[String] = sketch(df, keyCol, capacity)._1

  /** Exact PER-GROUP frequent items — the keyed twin of
    * [[topFrequent]] (the q_hll_groups story applied to frequent
    * items): one Misra-Gries summary per group via `groupBy(group)
    * .agg(udaf)`, candidates exploded and broadcast back for the exact
    * verify, thresholds in pure integers (support = num/den, threshold
    * = ceil(rows·num/den) per group). Unlike the global version this
    * is fully LAZY and distributed — no driver-side candidate collect;
    * the per-group row totals ride inside the sketch buffers.
    *
    * Bound: the broadcast candidate frame is ≤ |groups|·capacity rows —
    * pick a bounded-cardinality groupCol (source/domain/type, not a
    * document id). The MG guarantee holds per group (any key with
    * group-frequency > rows/capacity is a candidate), so with
    * capacity > den/num the exact verify makes the output EXACT — the
    * oracle is the plain per-group frequency threshold, proving sketch
    * completeness the same way the simhash oracle proves its blocking. */
  def topFrequentByGroup(df: DataFrame, groupCol: String, keyCol: String,
      supportNum: Long, supportDen: Long, capacity: Int = 0): DataFrame = {
    import graft.operators.Caches.Persisted
    require(supportNum > 0 && supportNum < supportDen,
      s"support must be a fraction in (0,1): $supportNum/$supportDen")
    val cap = if (capacity > 0) capacity
      else (2 * supportDen / supportNum + 1).toInt
    require(cap > supportDen.toDouble / supportNum,
      s"capacity $cap cannot guarantee support $supportNum/$supportDen")
    val agg = udaf(MisraGries(cap))
    // persisted: the tiny (|groups|-row) sketch frame feeds BOTH the
    // candidate explode and the row-total join — unpersisted, each
    // branch re-runs the corpus-sized sketch aggregation
    val sk = df.groupBy(col(groupCol)).agg(agg(col(keyCol)).as("_s"))
      .persistTracked
    val cands = sk.select(col(groupCol), explode(col("_s.keys")).as(keyCol))
    val rows = sk.select(col(groupCol), col("_s.rows").as("_rows"))
    df.join(broadcast(cands), Seq(groupCol, keyCol), "left_semi")
      .groupBy(col(groupCol), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(rows), Seq(groupCol))
      .where(col("n") >=
        expr(s"(_rows * $supportNum + ${supportDen - 1}) div $supportDen"))
      .select(col(groupCol), col(keyCol), col("n"))
      .orderBy(col(groupCol), col("n").desc, col(keyCol))
  }

  /** Exact frequent items with support ≥ `support` (fraction of rows),
    * via sketch → exact-verify. Output: (key, n), count-descending. */
  def topFrequent(df: DataFrame, keyCol: String, support: Double,
      capacity: Int = 0): DataFrame = {
    require(support > 0 && support < 1, "support in (0,1)")
    val cap = if (capacity > 0) capacity
      else math.max(2, math.ceil(2.0 / support).toInt)
    require(cap > 1.0 / support,
      s"capacity $cap cannot guarantee support $support")
    val (cands, n) = sketch(df, keyCol, cap)
    val threshold = math.ceil(support * n).toLong
    df.where(col(keyCol).isin(cands: _*))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
      .orderBy(col("n").desc, col(keyCol))
  }
}
