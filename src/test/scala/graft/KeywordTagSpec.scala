package graft

import graft.operators.KeywordTag
import org.scalatest.funsuite.AnyFunSuite

/** Aho–Corasick multi-pattern tagging: the automaton must report every
  * overlapping occurrence of every pattern (dict-suffix links), match a
  * naive positional count on random inputs, and the DataFrame operator
  * must aggregate per-(tag, term) totals including zero-hit terms. */
class KeywordTagSpec extends AnyFunSuite {
  import SparkTestSession._

  private def naiveCounts(text: String, pats: Seq[String]): Seq[Int] =
    pats.map { p =>
      (0 to text.length - p.length).count(i => text.startsWith(p, i))
    }

  test("classic he/she/his/hers fixture reports dict-suffix matches") {
    val ac = new KeywordTag.AhoCorasick(
      Array("he", "she", "his", "hers"))
    // "ushers": she at 1, he at 2 (inside she), hers at 2
    assert(ac.countsIn("ushers").toSeq == Seq(1, 1, 0, 1))
    assert(ac.countsIn("his hershey").toSeq == Seq(2, 1, 1, 1))
  }

  test("chained-suffix lexicon walks the dict links, linear memory") {
    // 'a'⊂'aa'⊂'aaa': every position must report every suffix pattern —
    // the case where per-node pre-merged outputs would go quadratic
    val ac = new KeywordTag.AhoCorasick(Array("a", "aa", "aaa"))
    assert(ac.countsIn("aaaa").toSeq == Seq(4, 3, 2))
    assert(ac.countsIn("ababa").toSeq == Seq(3, 0, 0))
  }

  test("self-overlapping pattern counts every occurrence") {
    val ac = new KeywordTag.AhoCorasick(Array("aa"))
    assert(ac.countsIn("aaaa").toSeq == Seq(3))
    val ac2 = new KeywordTag.AhoCorasick(Array("aba"))
    assert(ac2.countsIn("ababa").toSeq == Seq(2))
  }

  test("matches a naive positional count on seeded random inputs") {
    val rnd = new scala.util.Random(13)
    val alphabet = "abc"
    def randStr(n: Int) =
      Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    (1 to 50).foreach { _ =>
      val pats = Seq.fill(1 + rnd.nextInt(6))(randStr(1 + rnd.nextInt(4)))
        .distinct
      val text = randStr(200)
      val ac = new KeywordTag.AhoCorasick(pats.toArray)
      assert(ac.countsIn(text).toSeq == naiveCounts(text, pats),
        s"patterns=$pats")
    }
  }

  test("null text contributes zero counts") {
    val ac = new KeywordTag.AhoCorasick(Array("x"))
    assert(ac.countsIn(null).toSeq == Seq(0))
  }

  test("tagCounts aggregates per-(tag, term) totals with zero-hit rows") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the table is able"),          // table 1; able 2 (t-ABLE + able)
      (2L, "no hits here"),               // he 1 (h-e in "here")
      (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = KeywordTag.tagCounts(docs, "doc_id", "text",
        Seq("table" -> "schema", "able" -> "schema", "he" -> "pronoun",
          "zzz" -> "none"))
      .collect()
      .map(r => (r.getAs[String]("tag"), r.getAs[String]("term"),
        r.getAs[Long]("total"), r.getAs[Long]("docs"))).toSet
    assert(got == Set(
      ("schema", "table", 1L, 1L),
      ("schema", "able", 2L, 1L),
      ("pronoun", "he", 2L, 2L),  // doc1 "t-he", doc2 "he-re"
      ("none", "zzz", 0L, 0L)))
  }
}
