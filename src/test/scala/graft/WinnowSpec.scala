package graft

import graft.functions.Hashing
import graft.operators.{CorpusStats, Winnow}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WinnowSpec extends AnyFunSuite {
  import SparkTestSession._

  test("identical documents get identical fingerprint sets") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The  quick brown fox jumps over the LAZY dog".toLowerCase))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 3)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L).nonEmpty)
  }

  test("winnowing guarantee: a shared substring of length >= w+k-1 " +
      "yields a shared fingerprint") {
    import spark.implicits._
    val shared = "unique shared span of text here"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"zeta eta theta iota kappa $shared omega"))
      .toDF("doc_id", "text")
    val (k, w) = (5, 4)
    assert(shared.length >= w + k - 1)
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = k, w = w)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("disjoint-alphabet documents share no fingerprints; " +
      "overlapPairs flags only real overlap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (2L, "iiii jjjj kkkk llll mmmm nnnn oooo pppp"),
      (3L, "aaaa bbbb cccc dddd eeee ffff qqqq rrrr"))
      .toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 4, w = 3)
    val pairs = Winnow.overlapPairs(fps, "doc_id", minShared = 2)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((1L, 3L)))
  }

  test("portable kernel hash == the codegen'd md5Long56 expression " +
      "bit for bit, and both variants fingerprint") {
    import spark.implicits._
    val docs = Seq((1L, "some moderately long text for fingerprinting ok"))
      .toDF("doc_id", "text")
    val n64 = Winnow.fingerprints(docs, "doc_id", "text", 4, 3).count()
    val n56 = Winnow.fingerprints(docs, "doc_id", "text", 4, 3,
      portable = true).count()
    assert(n64 > 0 && n56 > 0)
    // the kernel's masked hash64Md5 must equal the expression md5Long56
    // on arbitrary strings — the oracle's replayability hinges on it
    val samples = Seq("abc", "winnow me", "x", "the quick brown fox")
    val expr = samples.toDF("s")
      .select(Hashing.md5Long56(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val md = java.security.MessageDigest.getInstance("MD5")
    val kernel = samples.map(s =>
      graft.operators.Dedup.hash64Md5(md, s) & 0xffffffffffffffL)
    assert(expr.toSeq == kernel)
    assert(expr.forall(v => v >= 0 && v < (1L << 56)))
  }

  test("kernel matches the naive sliding-min reference on random strings") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde f"
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(60)
      val s = Seq.fill(n)(alpha(rnd.nextInt(alpha.length))).mkString
      val (k, w) = (1 + rnd.nextInt(4), 1 + rnd.nextInt(5))
      val naive: Seq[Long] =
        if (s.length < k + w - 1) Seq.empty
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hs = (0 to s.length - k).map(i =>
            graft.operators.Dedup.hash64Md5(md, s.substring(i, i + k)) &
              0xffffffffffffffL)
          (0 to hs.length - w).map(j => hs.slice(j, j + w).min)
            .distinct.sorted
        }
      val got = graft.operators.Winnow
        .winnowKernel(s, k, w, portable = true).toSeq
      assert(got == naive, s"s='$s' k=$k w=$w")
    }
  }

  test("documents shorter than one window produce no fingerprints") {
    import spark.implicits._
    val docs = Seq((1L, "tiny")).toDF("doc_id", "text")
    assert(Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 10)
      .count() == 0L)
  }

  test("vocabStats ranks by freq and accumulates coverage to 1.0") {
    import spark.implicits._
    val docs = Seq("a a a b b c").toDF("text")
    val got = CorpusStats.vocabStats(docs, "text", k = 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((1, "a", 3L), (2, "b", 2L), (3, "c", 1L)))
    assert(got.last._4 == 1.0)
    assert(got.head._4 == 0.5)
  }

  test("knLogProb matches the hand-computed interpolated Kneser-Ney " +
      "fixture and quantizes exactly") {
    import spark.implicits._
    // corpus "a b a b a c": bigrams ab:2 ba:2 ac:1
    // ctx a: c=3 n1p=2; ctx b: c=2 n1p=1; cont types a:1 b:1 c:1, T=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = CorpusStats.knLogProb(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    def pkn(cab: Long, ca: Long, n1pA: Long, tb: Long, tAll: Long) =
      math.max(cab.toDouble - 0.75, 0.0) / ca.toDouble +
        (0.75 * n1pA.toDouble / ca.toDouble) * (tb.toDouble / tAll.toDouble)
    def q(p: Double): Long = math.floor(math.log(p) * 1000000).toLong
    val expected = // doc order: ab, ba, ab, ba, ac
      2 * q(pkn(2, 3, 2, 1, 3)) + 2 * q(pkn(2, 2, 1, 1, 3)) +
        q(pkn(1, 3, 2, 1, 3))
    val r = got(0)
    assert(r.getAs[Long]("sum_q6") == expected)
    assert(r.getAs[Long]("n_bigrams") == 5L)
    assert(r.getAs[Double]("avg_logprob") == expected.toDouble / 5e6)
  }

  test("knLogProb: P_KN over a context's continuations sums to 1 " +
      "(the interpolation identity), checked via single-bigram docs") {
    import spark.implicits._
    // Score every possible continuation of context "a" as its own doc;
    // exp of the per-doc logprob recovers P_KN(b|a), which must sum to 1
    // over the continuation vocabulary when the counts come from one
    // shared corpus. Build that corpus so every bigram is present.
    val corpus = Seq((1L, "a b a c a a b c")).toDF("doc_id", "text")
    val bigrams = Seq("a a", "a b", "a c") // all continuations of "a"
    val probe = corpus.unionByName(
      bigrams.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text"))
    val got = CorpusStats.knLogProb(probe, "doc_id", "text")
      .where(col("doc_id") >= 100L)
      .collect().map(_.getAs[Double]("avg_logprob"))
    val total = got.map(math.exp).sum
    // quantization costs at most ~1e-6 relative per term
    assert(math.abs(total - 1.0) < 1e-4, s"sum of P_KN(.|a) = $total")
  }

  test("kn3LogProb matches the hand-computed trigram Kneser-Ney fixture " +
      "and quantizes exactly") {
    import spark.implicits._
    // corpus "a b a b a c": trigrams aba:2 bab:1 bac:1
    // ctx2 (a,b): c=2 n1p=1; (b,a): c=2 n1p=2
    // cont2 (b,a):1 (a,b):1 (a,c):1; ctx1 b: tot=1 typ=1; a: tot=2 typ=2
    // cont1 a:1 b:1 c:1; T=3
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = CorpusStats.kn3LogProb(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    def pkn3(nAbc: Long, cAb: Long, n1pAb: Long, n1pBc: Long, totB: Long,
        typB: Long, n1pC: Long, tAll: Long): Double =
      math.max(nAbc.toDouble - 0.75, 0.0) / cAb.toDouble +
        (0.75 * n1pAb.toDouble / cAb.toDouble) *
          (math.max(n1pBc.toDouble - 0.75, 0.0) / totB.toDouble +
            (0.75 * typB.toDouble / totB.toDouble) *
              (n1pC.toDouble / tAll.toDouble))
    def q(p: Double): Long = math.floor(math.log(p) * 1000000).toLong
    val expected = // doc order: aba, bab, aba, bac
      2 * q(pkn3(2, 2, 1, 1, 1, 1, 1, 3)) +
        q(pkn3(1, 2, 2, 1, 2, 2, 1, 3)) +
        q(pkn3(1, 2, 2, 1, 2, 2, 1, 3))
    val r = got(0)
    assert(r.getAs[Long]("sum_q6") == expected)
    assert(r.getAs[Long]("n_trigrams") == 4L)
    assert(r.getAs[Double]("avg_logprob") == expected.toDouble / 4e6)
  }

  test("kn3LogProb: P_KN over a context's continuations sums to 1 " +
      "(the interpolation identity holds through both backoff levels)") {
    import spark.implicits._
    // Score every continuation of context "a b" as its own single-trigram
    // doc; exp(avg_logprob) recovers P(c|a,b), which must sum to 1 over
    // the full continuation vocabulary {a,b,c} of the combined corpus.
    val corpus = Seq((1L, "a b a c a a b c")).toDF("doc_id", "text")
    val trigrams = Seq("a b a", "a b b", "a b c")
    val probe = corpus.unionByName(
      trigrams.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text"))
    val got = CorpusStats.kn3LogProb(probe, "doc_id", "text")
      .where(col("doc_id") >= 100L)
      .collect().map(_.getAs[Double]("avg_logprob"))
    assert(got.length == 3)
    val total = got.map(math.exp).sum
    assert(math.abs(total - 1.0) < 1e-4, s"sum of P_KN(.|a,b) = $total")
  }

  test("kn5LogProb: P_KN over a 4-word context's continuations sums to " +
      "1 (the interpolation identity holds through four backoff levels)") {
    import spark.implicits._
    // Score every continuation of context "a b a b" as its own
    // single-5-gram doc; exp(avg_logprob) recovers P(w|a,b,a,b), which
    // must sum to 1 over the combined corpus's full vocabulary {a,b,c}
    // (the probes themselves put every letter in continuation position).
    val corpus = Seq((1L, "a b a b a c b c a a b")).toDF("doc_id", "text")
    val grams = Seq("a b a b a", "a b a b b", "a b a b c")
    val probe = corpus.unionByName(
      grams.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("doc_id", "text"))
    val got = CorpusStats.kn5LogProb(probe, "doc_id", "text")
      .where(col("doc_id") >= 100L)
      .collect().map(_.getAs[Double]("avg_logprob"))
    assert(got.length == 3)
    // proper probabilities: every quantized logprob is <= 0
    assert(got.forall(_ <= 0.0))
    val total = got.map(math.exp).sum
    assert(math.abs(total - 1.0) < 1e-4, s"sum of P_KN(.|a,b,a,b) = $total")
  }

  test("kn5LogProb covers exactly the docs with >= 5 tokens and agrees " +
      "with kn3LogProb's doc coverage contract") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d"), (3L, ""), (4L, "a b c d e"))
      .toDF("doc_id", "text")
    val got = CorpusStats.kn5LogProb(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("n_grams")).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L))
  }

  test("perplexityBands partitions scorable docs into head/middle/tail " +
      "consistent with an independent rank replay") {
    import spark.implicits._
    // 9 scorable docs with varying repetitiveness (repetitive = higher
    // logprob = head) + one unscorable short doc
    val docs = ((1L to 9L).map { i =>
      val rep = ("a b c d e " * i.toInt).trim
      val uniq = (1 to (10 - i.toInt)).map(j => s"w${i}_$j").mkString(" ")
      (i, s"$rep $uniq")
    } :+ (100L, "too short")).toDF("doc_id", "text")
    val got = CorpusStats.perplexityBands(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("avg_q6"),
        r.getAs[String]("band")))
    assert(got.length == 9) // the 2-token doc is unscorable
    // independent replay: nearest-rank bounds over ALL scores (sample =
    // everything at this size), then integer comparisons
    val byScore = got.sortBy(-_._2)
    val n = byScore.length
    val bHead = byScore(math.max(math.ceil(n / 3.0).toInt, 1) - 1)._2
    val bMid = byScore(math.max(math.ceil(n * 2.0 / 3.0).toInt, 1) - 1)._2
    got.foreach { case (id, q, band) =>
      val want = if (q >= bHead) "head" else if (q >= bMid) "middle"
        else "tail"
      assert(band == want, s"doc $id: $band != $want")
    }
    assert(got.map(_._3).toSet == Set("head", "middle", "tail"))
  }

  test("bigramPmi: collocated pair scores above independence") {
    import spark.implicits._
    // "x y" always adjacent; "p"/"q" never adjacent to each other
    val docs = Seq.fill(20)("x y p q").mkString(" ")
    val got = CorpusStats.bigramPmi(Seq(docs).toDF("text"), "text",
        minCount = 5)
      .collect().map(r => ((r.getAs[String]("w_a"), r.getAs[String]("w_b")),
        r.getAs[Long]("pmi_q6"))).toMap
    // x→y occurs every time x occurs → pmi > 0 (above independence)
    assert(got(("x", "y")) > 0)
  }
}
