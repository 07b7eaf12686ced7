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
    * Array-backed: `next` per-node char→child maps, `fail` links, `out`
    * pattern-index lists with dict-suffix outputs pre-merged, so the
    * scan loop never walks fail chains for output. */
  final class AhoCorasick(val patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "empty pattern set or empty pattern")
    private val next =
      scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.Map.empty[Char, Int])
    private val outBuf =
      scala.collection.mutable.ArrayBuffer(List.empty[Int])
    // trie
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var u = 0
      p.foreach { c =>
        u = next(u).getOrElseUpdate(c, {
          next += scala.collection.mutable.Map.empty[Char, Int]
          outBuf += Nil
          next.size - 1
        })
      }
      outBuf(u) = idx :: outBuf(u)
    }
    private val fail = new Array[Int](next.size)
    // BFS fail links; out(v) merges out(fail(v)) (dict-suffix links)
    locally {
      val queue = scala.collection.mutable.Queue.empty[Int]
      next(0).values.foreach { v => fail(v) = 0; queue += v }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        next(u).foreach { case (c, v) =>
          var f = fail(u)
          while (f != 0 && !next(f).contains(c)) f = fail(f)
          fail(v) = next(f).get(c).filter(_ != v).getOrElse(0)
          outBuf(v) = outBuf(v) ::: outBuf(fail(v))
          queue += v
        }
      }
    }
    private val out: Array[Array[Int]] = outBuf.map(_.toArray).toArray

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
        val o = out(state)
        var j = 0
        while (j < o.length) { counts(o(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Per-(tag, term) corpus totals: occurrence count + documents
    * touched. `lexicon` maps term → tag (terms matched lowercase as raw
    * substrings — overlaps and in-word hits count, the AC grain).
    * Returns (tag, term, total, docs) with only lexicon terms present
    * (zero-hit terms emit a 0-total row, so the output is always
    * |lexicon|-sized — bounded regardless of corpus size). */
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
