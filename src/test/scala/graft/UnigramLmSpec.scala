package graft

import graft.operators.UnigramLm
import org.scalatest.funsuite.AnyFunSuite

class UnigramLmSpec extends AnyFunSuite {
  import SparkTestSession._

  test("viterbi matches brute-force enumeration on a handcrafted lattice") {
    val scores = Map("▁a" -> -1.0, "▁ab" -> -1.2, "a" -> -2.0,
      "b" -> -2.0, "ab" -> -1.5, "▁" -> -3.0, "c" -> -2.5)
    def brute(w: String): (Double, Seq[String]) = {
      if (w.isEmpty) return (0.0, Nil)
      val cands = (1 to math.min(4, w.length)).flatMap { l =>
        val piece = w.take(l)
        val s = scores.getOrElse(piece,
          if (l == 1) -100.0 else Double.NegativeInfinity)
        if (s == Double.NegativeInfinity) None
        else {
          val (rs, rp) = brute(w.drop(l))
          Some((s + rs, piece +: rp))
        }
      }
      // mirror the tie-break: best score; among ties the LONGEST first
      // piece (viterbi's smallest-split-point backpointer)
      cands.maxBy(c => (c._1, c._2.head.length))
    }
    for (w <- Seq("▁ab", "▁abab", "▁abc", "▁ba", "▁ccc")) {
      val v = UnigramLm.viterbi(w, scores, 4)
      val (bs, bp) = brute(w)
      val vs = v.map(p => scores.getOrElse(p, -100.0)).sum
      assert(math.abs(vs - bs) < 1e-12, s"$w: $v vs $bp")
      assert(v.mkString == w, s"pieces must concatenate to $w")
    }
  }

  test("viterbi covers unknown characters via single-char fallback") {
    val v = UnigramLm.viterbi("▁xyz", Map("▁x" -> -1.0), 4)
    assert(v.mkString == "▁xyz")
    assert(v.head == "▁x" && v.tail == Seq("y", "z"))
  }

  test("train learns frequent substrings and keeps char coverage") {
    import spark.implicits._
    val docs = (0 until 50).map(i =>
      (i.toLong, "abab abab cdcd abab cdcd zz")).toDF("doc_id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 30, emIters = 2,
      multiSeeds = 40)
    val ps = m.pieces.map(_._1).toSet
    // every single char of the (marked) corpus survives pruning
    for (c <- "▁abcdz".map(_.toString)) assert(ps(c), s"missing char $c")
    // the dominant word body is learned as a multi-char piece (with or
    // without the boundary marker fused in — both are valid optima
    // depending on how probability mass splits onto '▁')
    assert(ps("▁abab") || ps("▁ab") || ps("abab") || ps("ab"),
      s"no frequent piece in $ps")
    // scores are log-probs: all negative, finite
    assert(m.pieces.forall(p => p._3 < 0 && !p._3.isNegInfinity))
  }

  test("training is partitioning-invariant") {
    import spark.implicits._
    val docs = (0 until 40).map(i =>
      (i.toLong, s"the quick fox the slow fox jumps")).toDF("doc_id", "text")
    val a = UnigramLm.train(docs.repartition(1), "text", vocabSize = 40)
    val b = UnigramLm.train(docs.repartition(7), "text", vocabSize = 40)
    assert(a.pieces == b.pieces)
  }

  test("decode(encode(docs)) is the normalized corpus exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "  The  Quick   brown FOX "),
      (2L, "pack my box with five dozen jugs"),
      (3L, "zz qq zz qq zz")).toDF("doc_id", "text")
    val m = UnigramLm.train(docs, "text", vocabSize = 60)
    val rt = UnigramLm.decode(
        UnigramLm.encode(docs, "doc_id", "text", m), "doc_id", "input_ids", m)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(1L) == "the quick brown fox")
    assert(rt(2L) == "pack my box with five dozen jugs")
    assert(rt(3L) == "zz qq zz qq zz")
  }

  test("soft-EM expectations: unique segmentation collapses to hard counts") {
    // only single chars known → exactly one lattice path; every char's
    // expectation is exactly 1.0 (q9 = 1e9)
    val scores = Map("a" -> -1.0, "b" -> -2.0)
    val e = UnigramLm.expectedCounts("ab", scores, maxPieceLen = 4).toMap
    assert(e == Map("a" -> 1000000000L, "b" -> 1000000000L))
  }

  test("soft-EM expectations: an exact two-way tie splits mass 50/50") {
    // paths: [a,b] score -1-1 = -2; [ab] score -2 — equal likelihood,
    // so P = 0.5 each: E(ab) = 0.5, E(a) = E(b) = 0.5. Viterbi (hard)
    // would give winner-take-all instead.
    val scores = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    val e = UnigramLm.expectedCounts("ab", scores, maxPieceLen = 4).toMap
    // floor quantization may land one ulp under the exact half
    assert(e.keySet == Set("a", "b", "ab"))
    e.values.foreach(q =>
      assert(math.abs(q - 500000000L) <= 1L, s"off-half: $e"))
    val hard = UnigramLm.viterbi("ab", scores, maxPieceLen = 4)
    assert(hard.size == 1 || hard.size == 2) // one winner, all the mass
  }

  test("soft-EM expectations: position-0 pieces carry total mass 1") {
    // every lattice path starts with exactly one piece at position 0;
    // 'x' occurs only at position 0 of "xab", so the string-keyed sums
    // of the x-prefixed pieces ARE the position-0 edge expectations and
    // must total 1. Total expected piece count is bounded by the word.
    val scores = Map("x" -> -1.0, "a" -> -1.2, "b" -> -0.7,
      "xa" -> -1.5, "ab" -> -1.5, "xab" -> -2.5)
    val e = UnigramLm.expectedCounts("xab", scores, maxPieceLen = 3).toMap
    val firstMass =
      (e.getOrElse("x", 0L) + e.getOrElse("xa", 0L) +
        e.getOrElse("xab", 0L)) / 1e9
    assert(math.abs(firstMass - 1.0) < 1e-8, s"first-cut mass $firstMass")
    val total = e.values.sum / 1e9
    assert(total >= 1.0 - 1e-6 && total <= 3.0 + 1e-6)
  }

  test("soft-EM training is deterministic and round-trips exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abab abab baba"),
      (2L, "abab baba abab abab"),
      (3L, "the quick brown fox abab")).toDF("doc_id", "text")
    val a = UnigramLm.train(docs.repartition(1), "text", vocabSize = 40,
      emMode = "soft")
    val b = UnigramLm.train(docs.repartition(5), "text", vocabSize = 40,
      emMode = "soft")
    assert(a.pieces == b.pieces)
    val rt = UnigramLm.decode(
        UnigramLm.encode(docs, "doc_id", "text", a), "doc_id",
        "input_ids", a)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt(1L) == "abab abab baba")
    assert(rt(3L) == "the quick brown fox abab")
  }

  test("soft-EM spreads mass over ambiguous pieces where hard-EM picks one") {
    import spark.implicits._
    // 'abab' is ambiguous between [ab][ab] and [a][ba][b]-style cuts;
    // soft expectations give COMPETING pieces fractional mass where
    // hard counts are winner-take-all per word
    val docs = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val soft = UnigramLm.train(docs, "text", vocabSize = 30,
      emIters = 1, emMode = "soft")
    val hard = UnigramLm.train(docs, "text", vocabSize = 30,
      emIters = 1, emMode = "hard")
    // the two E-steps must actually train different statistics — if a
    // regression collapsed soft onto Viterbi counts this fails
    assert(soft.pieces != hard.pieces,
      "soft-EM produced identical model to hard-EM on an ambiguous corpus")
    // fractional mass: under hard-EM every count is an integer multiple
    // of the word frequency (3) — each word contributes freq per chosen
    // piece occurrence; soft expectations split lattice mass, so some
    // piece's rounded count escapes the multiple-of-3 grid
    assert(soft.pieces.exists(_._2 % 3 != 0),
      s"no fractional soft count in ${soft.pieces}")
  }
}
