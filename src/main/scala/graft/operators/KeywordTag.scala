package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern dictionary tagging via Aho–Corasick (Aho & Corasick
  * 1975): match an entire lexicon — PII term lists, topic lexicons,
  * brand/blocklist dictionaries — against the corpus in ONE text pass.
  *
  * The naive plan is |lexicon| regexp/instr scans over 100 TB (one full
  * corpus read per term, or one giant alternation regex whose NFA
  * backtracks); the automaton is O(text + matches) per row regardless of
  * lexicon size. Matches are SUBSTRING occurrences including overlaps
  * (dict-suffix links report every pattern ending at every position —
  * "he" inside "she" counts both), which is exactly the positional
  * count a SQL oracle can replay, so the whole operator is
  * oracle-checkable.
  *
  * Scale shape: the automaton builds once on the driver (size = total
  * pattern characters — a 10⁶-term lexicon is still MBs) and rides the
  * task closure of a per-row scan kernel UDF (the Winnow-kernel
  * discipline: an imperative O(n) kernel where regex chains or HOFs
  * would run interpreted per pattern); the scan is a narrow projection
  * — zero shuffles before the |lexicon|-sized per-tag aggregate.
  */
object KeywordTag {

  /** Serializable Aho–Corasick automaton over lowercase patterns.
    * Memory is LINEAR in total pattern characters: each node stores only
    * the patterns ending exactly there (`ownOut`) plus a dict-suffix
    * link (`dictLink` = nearest proper-suffix node that ends a pattern),
    * walked at scan time — pre-merging suffix outputs per node would be
    * quadratic for chained-suffix lexicons ('a','aa','aaa',…). Scan
    * stays O(text + matches): the dict chain is entered only when it is
    * non-empty, and every hop reports ≥ 1 match. Construction
    * scaffolding lives in local buffers, so the serialized instance
    * (the task-closure payload) carries exactly the final arrays. */
  final class AhoCorasick(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "empty pattern set or empty pattern")
    private val (next, fail, ownOut, dictLink):
        (Array[scala.collection.immutable.Map[Char, Int]], Array[Int],
          Array[Array[Int]], Array[Int]) = {
      val nxt = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
      val own = scala.collection.mutable.ArrayBuffer(List.empty[Int])
      patterns.zipWithIndex.foreach { case (p, idx) =>
        var u = 0
        p.foreach { c =>
          u = nxt(u).getOrElseUpdate(c, {
            nxt += scala.collection.mutable.Map.empty[Char, Int]
            own += Nil
            nxt.size - 1
          })
        }
        own(u) = idx :: own(u)
      }
      val fl = new Array[Int](nxt.size)
      val dl = new Array[Int](nxt.size) // 0 = end of chain (root ends none)
      val queue = scala.collection.mutable.Queue.empty[Int]
      nxt(0).values.foreach { v => fl(v) = 0; dl(v) = 0; queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        nxt(u).foreach { case (c, v) =>
          var f = fl(u)
          while (f != 0 && !nxt(f).contains(c)) f = fl(f)
          fl(v) = nxt(f).get(c).filter(_ != v).getOrElse(0)
          dl(v) = if (own(fl(v)).nonEmpty) fl(v) else dl(fl(v))
          queue += v
        }
      }
      (nxt.map(_.toMap).toArray, fl, own.map(_.toArray).toArray, dl)
    }

    /** Occurrence count per pattern (overlaps included), one text pass. */
    def countsIn(text: String): Array[Int] = {
      val counts = new Array[Int](patterns.length)
      if (text == null) return counts
      var state = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        while (state != 0 && !next(state).contains(c)) state = fail(state)
        state = next(state).getOrElse(c, 0)
        var u = if (ownOut(state).nonEmpty) state else dictLink(state)
        while (u != 0) {
          val o = ownOut(u)
          var j = 0
          while (j < o.length) { counts(o(j)) += 1; j += 1 }
          u = dictLink(u)
        }
        i += 1
      }
      counts
    }
  }

  /** Per-(tag, term) corpus totals: occurrence count + documents
    * touched. `lexicon` maps term → tag (terms matched lowercase as raw
    * substrings — overlaps and in-word hits count, the AC grain).
    * Returns (tag, term, total, docs): one row per lexicon term on any
    * non-empty input (zero-hit terms emit a 0-total row because every
    * document explodes to all |lexicon| counters), so the output is
    * |lexicon|-bounded regardless of corpus size; an EMPTY input yields
    * an empty frame, not zero rows per term. */
  def tagCounts(docs: DataFrame, idCol: String, textCol: String,
      lexicon: Seq[(String, String)]): DataFrame = {
    val terms = lexicon.map(_._1.toLowerCase).toArray
    val tags = lexicon.map(_._2).toArray
    val ac = new AhoCorasick(terms)
    val countUdf = udf { (text: String) =>
      ac.countsIn(if (text == null) null else text.toLowerCase)
    }
    docs
      .select(col(idCol).as("doc_id"),
        countUdf(col(textCol)).as("counts"))
      .select(posexplode(col("counts")).as(Seq("term_idx", "n")))
      .groupBy("term_idx")
      .agg(sum("n").as("total"),
        count(when(col("n") > 0, 1)).as("docs"))
      .select(
        element_at(lit(tags), col("term_idx") + 1).as("tag"),
        element_at(lit(terms), col("term_idx") + 1).as("term"),
        col("total"), col("docs"))
  }
}
