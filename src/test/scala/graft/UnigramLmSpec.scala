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
}
