package graft

import graft.operators.EvalMetrics
import org.scalatest.funsuite.AnyFunSuite

/** Generation-eval metrics: hand-computed chrF fixtures (multiset
  * clipping, the short-string order penalty, the both-empty zero row),
  * CER against known edit distances, and distinct-n with the
  * short-document guard. */
class EvalMetricsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def runChrf(rows: Seq[(Long, String, String)], maxOrder: Int) = {
    import spark.implicits._
    EvalMetrics.chrF(rows.toDF("id", "hyp", "ref"), "id", "hyp", "ref",
        maxOrder = maxOrder)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("prec_ppm"), r.getAs[Long]("rec_ppm"),
          r.getAs[Long]("chrf_ppm"))).toMap
  }

  test("chrF: hand-computed multiset clipping at maxOrder=2") {
    val got = runChrf(Seq(
      // O1: both {a:2, b:2} -> P1=R1=10^6. O2: hyp {ab:2, ba:1},
      // ref {ab:1, bb:1, ba:1} -> clipped m=2 of 3 -> 666666 both.
      // avg 833333 both; F symmetric -> 833333.
      (1L, "abab", "abba"),
      // O1: m=2, ht=2, rt=3 -> P1=10^6, R1=666666. O2: hyp {aa:1},
      // ref {aa:2} -> m=1 -> P2=10^6, R2=500000. avgP=10^6,
      // avgR=583333; F = 5*1e6*583333 div (4*1e6+583333) = 636363.
      (2L, "aa", "aaa"),
      // whitespace stripped before gram extraction: identical to "ab"
      // vs "ab" -> all 10^6
      (3L, "a b", "ab")), maxOrder = 2)
    assert(got(1L) == ((833333L, 833333L, 833333L)), got.toString)
    assert(got(2L) == ((1000000L, 583333L, 636363L)), got.toString)
    assert(got(3L) == ((1000000L, 1000000L, 1000000L)))
  }

  test("chrF: short strings are penalized for missing orders; a " +
      "both-empty pair emits an all-zero row, not nothing") {
    val got = runChrf(Seq(
      // only order 1 exists; its perfect 10^6 averages over BOTH
      // orders -> 500000, F(500000, 500000) = 500000
      (1L, "a", "a"),
      (2L, "", ""),
      (3L, "   ", " ")), maxOrder = 2)
    assert(got(1L) == ((500000L, 500000L, 500000L)), got.toString)
    assert(got(2L) == ((0L, 0L, 0L)))
    assert(got(3L) == ((0L, 0L, 0L)), "whitespace-only = empty")
    assert(got.size == 3, "every input pair must be accounted for")
  }

  test("chrF: disjoint strings score 0; identical long strings score " +
      "10^6 at the default order") {
    val got = runChrf(Seq(
      (1L, "aaaa", "bbbb"),
      (2L, "the quick brown fox", "the quick brown fox")), maxOrder = 6)
    assert(got(1L) == ((0L, 0L, 0L)))
    assert(got(2L) == ((1000000L, 1000000L, 1000000L)))
  }

  test("chrF: the zero-shuffle native kernel equals the exploded-agg " +
      "dataflow bit-for-bit on corpus-derived pairs (incl. multi-byte " +
      "code points)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .where(col("text").isNotNull).limit(120)
    val pairs = docs.select(col("doc_id"), col("text").as("hyp"))
      .join(docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("ref")), Seq("doc_id"))
      // splice in multi-byte content: numChars/substringSQL vs the
      // Column substr must agree on code points, not bytes
      .unionByName(Seq(
        (900001L, "héllo wörld déjà", "héllo wörld vu déjà"),
        (900002L, "日本語のテキスト", "日本語テキスト"),
        (900003L, "abc😀def", "abc😀xef"))
        .toDF("doc_id", "hyp", "ref"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val native = EvalMetrics.chrF(pairs, "doc_id", "hyp", "ref")
    val viaAgg = EvalMetrics.chrFViaAgg(pairs, "doc_id", "hyp", "ref")
    assert(canon(native) == canon(viaAgg))
    // and the metric itself adds NO shuffle on top of its input: over
    // a join-free source the whole plan is exchange-free (the pairs
    // frame above contains a join of its own, so assert on a literal)
    val lit = Seq((1L, "ab", "ba")).toDF("doc_id", "hyp", "ref")
    val plan = EvalMetrics.chrF(lit, "doc_id", "hyp", "ref")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"native chrF must be shuffle-free:\n$plan")
  }

  test("tokenF1: hand-computed clipped token overlap; zero-token " +
      "sides score 0 and still emit a row") {
    import spark.implicits._
    val got = EvalMetrics.tokenF1(Seq(
        // hyp {a:2, b, c} vs ref {a:2, b, d}: m = 3 of 4/4 ->
        // P = R = 750000, F1 = 750000
        (1L, "a b a c", "a a b d"),
        // case + whitespace normalization: identical after lowering
        (2L, "The  Cat", "the cat"),
        (3L, "x y", ""),          // empty ref: P irrelevant, R/F1 0
        (4L, "", ""),             // both empty: all zero, row kept
        (5L, "a", "b")).toDF("id", "hyp", "ref"), "id", "hyp", "ref")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_match"), r.getAs[Long]("prec_ppm"),
          r.getAs[Long]("rec_ppm"), r.getAs[Long]("f1_ppm"))).toMap
    assert(got(1L) == ((3L, 750000L, 750000L, 750000L)), got.toString)
    assert(got(2L) == ((2L, 1000000L, 1000000L, 1000000L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L)))
    assert(got(5L) == ((0L, 0L, 0L, 0L)))
    assert(got.size == 5)
  }

  test("rougeL: hand-computed LCS fixtures — order sensitivity, " +
      "repeats, zero-token sides still emit a row, maxTokens bound") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, String)], maxTokens: Int = 0) =
      EvalMetrics.rougeL(rows.toDF("id", "hyp", "ref"), "id", "hyp",
          "ref", maxTokens = maxTokens)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("lcs_len"), r.getAs[Long]("prec_ppm"),
            r.getAs[Long]("rec_ppm"), r.getAs[Long]("rouge_l_ppm")))
        .toMap
    val got = run(Seq(
      // LCS(abcd, acbd) = 3 (abd or acd): P = R = F = 750000
      (1L, "a b c d", "a c b d"),
      // LCS = 3 of hyp 3 / ref 6: P = 10^6, R = 500000, F = 666666
      (2L, "the cat sat", "the cat sat on the mat"),
      // repeats: LCS(bab, abab) = 3 -> P = 10^6, R = 750000,
      // F = 2*10^6*750000 div 1750000 = 857142
      (3L, "b a b", "a b a b"),
      // SAME BAG, different order: LCS = 1 where tokenF1 scores 2 —
      // the order sensitivity that distinguishes the two metrics
      (4L, "a b", "b a"),
      (5L, "x y", ""),            // empty ref: zeros, row kept
      (6L, "", ""),               // both empty: zeros, row kept
      (7L, null, "a b"),          // null hyp: zeros, row kept
      // multi-byte tokens compare as code-point strings
      (8L, "héllo wörld déjà", "héllo déjà wörld")))
    assert(got(1L) == ((3L, 750000L, 750000L, 750000L)), got.toString)
    assert(got(2L) == ((3L, 1000000L, 500000L, 666666L)), got.toString)
    assert(got(3L) == ((3L, 1000000L, 750000L, 857142L)), got.toString)
    assert(got(4L) == ((1L, 500000L, 500000L, 500000L)))
    assert(got(5L) == ((0L, 0L, 0L, 0L)))
    assert(got(6L) == ((0L, 0L, 0L, 0L)))
    assert(got(7L) == ((0L, 0L, 0L, 0L)))
    assert(got(8L) == ((2L, 666666L, 666666L, 666666L)))
    assert(got.size == 8)
    // maxTokens truncates BOTH sides before the DP: first-2 tokens
    // share nothing here, so the bounded score is 0 of 2-vs-2
    val capped = run(Seq((1L, "a b c d e", "c d e a b")), maxTokens = 2)
    assert(capped(1L) == ((0L, 0L, 0L, 0L)), capped.toString)
  }

  test("rougeN: hand-computed bigram fixtures; ROUGE-1 coincides " +
      "with tokenF1's P/R/F on the corpus (same normalization, same " +
      "clipping)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val got = EvalMetrics.rougeN(Seq(
        // hyp bigrams {ab, bc, cd}; ref bigrams {ab, bd, dc}:
        // clipped m = 1 -> P = R = 333333, F = 333333
        (1L, "a b c d", "a b d c"),
        // repeats clip: hyp {aa, aa}? tokens a a a -> bigrams
        // {"a a","a a"}; ref a a -> {"a a"}: m = 1, P = 500000,
        // R = 10^6, F = 666666
        (2L, "a a a", "a a"),
        (3L, "x", "x"),          // no bigram on either side: zeros
        (4L, "p q", ""))         // empty ref: zeros, row kept
        .toDF("id", "hyp", "ref"), "id", "hyp", "ref", n = 2)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_match"), r.getAs[Long]("prec_ppm"),
          r.getAs[Long]("rec_ppm"), r.getAs[Long]("f1_ppm"))).toMap
    assert(got(1L) == ((1L, 333333L, 333333L, 333333L)), got.toString)
    assert(got(2L) == ((1L, 500000L, 1000000L, 666666L)), got.toString)
    assert(got(3L) == ((0L, 0L, 0L, 0L)))
    assert(got(4L) == ((0L, 0L, 0L, 0L)))
    // ROUGE-1 == tokenF1 modulo column names (the scaladoc claim)
    val docs = graft.Tables.documents(spark, sf)
      .where(col("text").isNotNull).limit(100)
    val pairs = docs.select(col("doc_id"), col("text").as("hyp"))
      .join(docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("ref")), Seq("doc_id"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(EvalMetrics.rougeN(pairs, "doc_id", "hyp", "ref", 1)
        .select("doc_id", "n_match", "prec_ppm", "rec_ppm", "f1_ppm")) ==
      canon(EvalMetrics.tokenF1(pairs, "doc_id", "hyp", "ref")
        .select("doc_id", "n_match", "prec_ppm", "rec_ppm", "f1_ppm")))
  }

  test("rougeL: the native O(m*n) kernel equals the prefix-max fold " +
      "(the oracle's recurrence) bit-for-bit on corpus pairs, and the " +
      "metric is shuffle-free") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
      .where(col("text").isNotNull).limit(120)
    val pairs = docs.select(col("doc_id"), col("text").as("hyp"))
      .join(docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("ref")), Seq("doc_id"))
      .unionByName(Seq(
        (900001L, "héllo wörld déjà vu", "déjà wörld héllo vu"),
        (900002L, "日本語 の テキスト", "日本語 テキスト の"),
        (900003L, "a 😀 b 😀", "😀 a 😀 b"))
        .toDF("doc_id", "hyp", "ref"))
    graft.plans.GraftExtensions.register(spark)
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(trim(c)), "\\s+"), x => length(x) > 0)
    val both = pairs.select(col("doc_id"),
        toks(col("hyp")).as("ht"), toks(col("ref")).as("rt"))
      .select(col("doc_id"),
        graft.plans.ArrayLcsLengthExpression
          .lcsNative(col("ht"), col("rt")).as("native"),
        EvalMetrics.lcsLenViaFold(col("ht"), col("rt")).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getAs[Long]("native") == r.getAs[Long]("fold"),
        s"doc ${r.get(0)}: native ${r.get(1)} != fold ${r.get(2)}")
    }
    val lit = Seq((1L, "a b", "b a")).toDF("doc_id", "hyp", "ref")
    val plan = EvalMetrics.rougeL(lit, "doc_id", "hyp", "ref")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"native rougeL must be shuffle-free:\n$plan")
  }

  test("rougeLsum: hand-computed union-LCS fixtures incl. Lin 2004's " +
      "own example, multi-newline and empty-sentence edges, the " +
      "global token clipping (r15 advice), maxTokens") {
    import spark.implicits._
    def run(rows: Seq[(Long, String, String)], maxTokens: Int = 0) =
      EvalMetrics.rougeLsum(rows.toDF("id", "hyp", "ref"), "id", "hyp",
          "ref", maxTokens = maxTokens)
        .collect().map(r => r.getAs[Long]("id") ->
          (r.getAs[Long]("union_hits"), r.getAs[Long]("n_hyp"),
            r.getAs[Long]("n_ref"), r.getAs[Long]("prec_ppm"),
            r.getAs[Long]("rec_ppm"), r.getAs[Long]("rouge_lsum_ppm")))
        .toMap
    val got = run(Seq(
      // Lin 2004 §3.2's example: r = w1..w5, c1 = w1 w2 w6 w7 w8,
      // c2 = w1 w3 w8 w9 w5 — union {w1, w2, w3, w5} = 4
      (1L, "w1 w2 w6 w7 w8\nw1 w3 w8 w9 w5", "w1 w2 w3 w4 w5"),
      // consecutive newlines mint an empty sentence — dropped, and
      // sentence-split coverage still reaches every token
      (2L, "a b c\n\nd e", "a b\nc d e"),
      // single sentence both sides, perfect match
      (3L, "same line only", "same line only"),
      (4L, "", "x y z"),          // empty hyp: zeros, row kept
      (5L, "x y", ""),            // empty ref: zeros, row kept
      (6L, null, "a b"),          // null hyp: zeros, row kept
      // case/whitespace noise normalizes away
      (7L, "The  Cat \n sat", "the cat\nSAT down"),
      // CLIPPING binds (rouge-score's global token counters, r15
      // advice): both 'a's of the ref are ∃-optimal members against
      // the 1-token hypothesis, but the hypothesis supplies only one
      // 'a' — hits = min(2, 1) = 1, and precision stays ≤ 10⁶
      (8L, "a", "a a"),
      // a repeated stopword ACROSS ref sentences with matching hyp
      // supply: 'the' is a member in both ref sentences (k=2) and the
      // hyp holds two — min(2,2) + 'cat' min(1,1) = 3 ('dog' never
      // matches)
      (10L, "the the cat", "the cat\nthe dog"),
      // 'x' is a member in THREE ref sentences but the hyp has one:
      // x min(3,1) + y min(1,1) = 2
      (11L, "x y z", "x\nx\nx y")))
    assert(got(1L) == ((4L, 10L, 5L, 400000L, 800000L, 533333L)),
      got.toString)
    assert(got(2L) == ((5L, 5L, 5L, 1000000L, 1000000L, 1000000L)),
      got.toString)
    assert(got(3L) == ((3L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
    assert(got(4L) == ((0L, 0L, 3L, 0L, 0L, 0L)))
    assert(got(5L) == ((0L, 2L, 0L, 0L, 0L, 0L)))
    assert(got(6L) == ((0L, 0L, 2L, 0L, 0L, 0L)))
    assert(got(7L) == ((3L, 3L, 4L, 1000000L, 750000L, 857142L)),
      got.toString)
    assert(got(8L) == ((1L, 1L, 2L, 1000000L, 500000L, 666666L)),
      got.toString)
    assert(got(10L) == ((3L, 3L, 4L, 1000000L, 750000L, 857142L)),
      got.toString)
    assert(got(11L) == ((2L, 3L, 4L, 666666L, 500000L, 571428L)),
      got.toString)
    assert(got.size == 10)
    // maxTokens truncates every SENTENCE: the matched tail tokens
    // fall off both sides' sentences
    val capped = run(Seq((1L, "a b c\nd e f", "c\nf")), maxTokens = 2)
    assert(capped(1L) == ((0L, 4L, 2L, 0L, 0L, 0L)), capped.toString)
    val full = run(Seq((1L, "a b c\nd e f", "c\nf")))
    assert(full(1L) == ((2L, 6L, 2L, 333333L, 1000000L, 499999L)),
      full.toString)
  }

  test("rougeLsum: the native kernel equals an independent Scala " +
      "reference (prefix/suffix DP membership) on folded corpus " +
      "pairs, and the metric is shuffle-free") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // reference implementation: full DP tables, ∃-optimal membership
    def toks(s: String): Array[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
    def sents(t: String): Array[Array[String]] =
      t.split("\n", -1).map(toks).filter(_.nonEmpty)
    def table(x: Array[String], y: Array[String]): Array[Array[Int]] = {
      val dp = Array.ofDim[Int](x.length + 1, y.length + 1)
      for (i <- 1 to x.length; j <- 1 to y.length)
        dp(i)(j) = if (x(i - 1) == y(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp
    }
    def refHits(hyp: String, ref: String): Long = {
      val hs = sents(hyp)
      // rouge-score's global clipping counters (hyp token supply)
      val supply = scala.collection.mutable.Map.empty[String, Int]
        .withDefaultValue(0)
      hs.foreach(_.foreach(t => supply(t) += 1))
      hs.length match {
        case 0 => 0L
        case _ => sents(ref).map { x =>
          val m = x.length
          val marked = new Array[Boolean](m + 1)
          hs.foreach { y =>
            val n = y.length
            val fwd = table(x, y)
            val bwd = table(x.reverse, y.reverse)
            val tot = fwd(m)(n)
            for (p <- 1 to m; q <- 1 to n)
              if (x(p - 1) == y(q - 1) &&
                fwd(p - 1)(q - 1) + 1 + bwd(m - p)(n - q) == tot)
                marked(p) = true
          }
          (1 to m).count { p =>
            marked(p) && supply(x(p - 1)) > 0 && {
              supply(x(p - 1)) -= 1; true
            }
          }.toLong
        }.sum
      }
    }
    // fold word-soup docs into 6-word lines (the q_rouge_lsum shape)
    val docs = graft.Tables.documents(spark, sf)
      .where(col("text").isNotNull).limit(60)
    def fold(c: org.apache.spark.sql.Column) = {
      val ws = split(c, " ")
      val nLines = ceil(size(ws) / lit(6.0)).cast("int")
      array_join(
        transform(sequence(lit(0), greatest(nLines - 1, lit(0))),
          j => array_join(slice(ws, j * 6 + 1, lit(6)), " ")), "\n")
    }
    val pairs = docs.select(col("doc_id"), col("text").as("h"))
      .join(docs.select((col("doc_id") - 1).as("doc_id"),
        col("text").as("r")), Seq("doc_id"))
      .select(col("doc_id"), fold(col("h")).as("hyp"),
        fold(col("r")).as("ref"))
    val gotRows = EvalMetrics.rougeLsum(pairs, "doc_id", "hyp", "ref")
      .join(pairs, Seq("doc_id"))
      .select("doc_id", "union_hits", "hyp", "ref")
      .collect()
    assert(gotRows.length >= 50)
    gotRows.foreach { r =>
      val want = refHits(r.getAs[String]("hyp"), r.getAs[String]("ref"))
      assert(r.getAs[Long]("union_hits") == want,
        s"doc ${r.get(0)}: kernel ${r.get(1)} != reference $want")
    }
    val lit2 = Seq((1L, "a b\nc", "b a")).toDF("doc_id", "hyp", "ref")
    val plan = EvalMetrics.rougeLsum(lit2, "doc_id", "hyp", "ref")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"native rougeLsum must be shuffle-free:\n$plan")
  }

  test("cer: native levenshtein over whitespace-normalized strings; " +
      "empty references are not emitted") {
    import spark.implicits._
    val got = EvalMetrics.cer(Seq(
        (1L, "kitten", "sitting"),    // classic lev = 3, ref 7 chars
        (2L, "a   b", "a b"),         // normalization: distance 0
        (3L, "abc", ""),              // empty ref: dropped
        (4L, null, "abc"),            // null hyp: dropped
        (5L, "xyz", "ab"))            // CER > 10^6 is legal
      .toDF("id", "hyp", "ref"), "id", "hyp", "ref")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("edit_dist"), r.getAs[Long]("cer_ppm"))).toMap
    assert(got(1L) == ((3L, 3000000L / 7)), got.toString)
    assert(got(2L) == ((0L, 0L)))
    assert(!got.contains(3L) && !got.contains(4L))
    assert(got(5L) == ((3L, 1500000L)))
  }

  test("logBleu: perfect pair scores exactly 0; brevity penalty, +1 " +
      "smoothing, and effective-order averaging replay the JVM " +
      "arithmetic; zero-token pairs are not emitted") {
    import spark.implicits._
    val got = EvalMetrics.logBleu(Seq(
        (1L, "a b c d", "a b c d"),   // perfect: every p_n = 1, BP 0
        (2L, "a b c", "a b c d"),     // all precisions 1, short: BP only
        (3L, "a b", "x y"),           // disjoint: smoothed p1/p2
        (4L, "", "a b"))              // empty hyp: dropped
      .toDF("id", "hyp", "ref"), "id", "hyp", "ref")
      .collect().map(r => r.getAs[Long]("id") ->
        r.getAs[Long]("log_bleu_micro")).toMap
    assert(got(1L) == 0L, got.toString)
    // hyp 3 toks vs ref 4: eff orders 1..3 all at p=1 (m_n = t_n, so
    // (m+1)/(t+1) = 1), ln-sum 0 -> score = floor((1 - 4/3) * 1e6)
    val bp2 = math.floor(
      math.min(0.0, 1.0 - 4.0 / 3.0) * 1e6).toLong
    assert(got(2L) == bp2 && bp2 == -333334L, got.toString)
    // disjoint 2-token pair: p1 = 1/3, p2 = 1/2, eff = 2, BP 0
    val exp3 = math.floor(
      ((math.log(1.0 / 3.0) + math.log(2.0 / 4.0)) / 2.0) * 1e6).toLong
    assert(got(3L) == exp3, s"got ${got(3L)}, want $exp3")
    assert(!got.contains(4L))
  }

  test("the zero-shuffle metrics run UNCHANGED over a stream (narrow " +
      "projections need no state, no watermark, no output-mode care)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "a b a c", "a a b d"), (2L, "x", "x"),
      (3L, "q w e", "q w"))
    val input = MemoryStream[(Long, String, String)]
    val q = EvalMetrics.tokenF1(
        input.toDS().toDF("id", "hyp", "ref"), "id", "hyp", "ref")
      .writeStream.format("memory").queryName("f1_stream")
      .outputMode("append").start()
    try {
      input.addData(rows.take(2): _*); q.processAllAvailable()
      input.addData(rows.drop(2): _*); q.processAllAvailable()
    } finally q.stop()
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(spark.table("f1_stream")) ==
      canon(EvalMetrics.tokenF1(rows.toDF("id", "hyp", "ref"),
        "id", "hyp", "ref")))
    // the r14 members are the same narrow shape — rougeL's DP kernel
    // and rougeN's gram arrays are row-local, so both stream as-is
    val input2 = MemoryStream[(Long, String, String)]
    val q2 = EvalMetrics.rougeL(
        input2.toDS().toDF("id", "hyp", "ref"), "id", "hyp", "ref")
      .writeStream.format("memory").queryName("rl_stream")
      .outputMode("append").start()
    val input3 = MemoryStream[(Long, String, String)]
    val q3 = EvalMetrics.rougeN(
        input3.toDS().toDF("id", "hyp", "ref"), "id", "hyp", "ref",
        n = 2)
      .writeStream.format("memory").queryName("r2_stream")
      .outputMode("append").start()
    try {
      input2.addData(rows: _*); q2.processAllAvailable()
      input3.addData(rows: _*); q3.processAllAvailable()
    } finally { q2.stop(); q3.stop() }
    assert(canon(spark.table("rl_stream")) ==
      canon(EvalMetrics.rougeL(rows.toDF("id", "hyp", "ref"),
        "id", "hyp", "ref")))
    assert(canon(spark.table("r2_stream")) ==
      canon(EvalMetrics.rougeN(rows.toDF("id", "hyp", "ref"),
        "id", "hyp", "ref", n = 2)))
  }

  test("id/group columns named like a metric's outputs fail fast " +
      "(the groupAdvantages collision convention)") {
    import spark.implicits._
    val pairs = Seq((1L, "a", "a")).toDF("f1_ppm", "hyp", "ref")
    val e1 = intercept[IllegalArgumentException] {
      EvalMetrics.tokenF1(pairs, "f1_ppm", "hyp", "ref")
    }
    assert(e1.getMessage.contains("collides"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      EvalMetrics.chrF(Seq((1L, "a", "a"))
        .toDF("chrf_ppm", "hyp", "ref"), "chrf_ppm", "hyp", "ref")
    }
    assert(e2.getMessage.contains("collides"))
    val e3 = intercept[IllegalArgumentException] {
      EvalMetrics.cer(Seq((1L, "a", "a"))
        .toDF("cer_ppm", "hyp", "ref"), "cer_ppm", "hyp", "ref")
    }
    assert(e3.getMessage.contains("collides"))
    val e4 = intercept[IllegalArgumentException] {
      EvalMetrics.logBleu(Seq((1L, "a", "a"))
        .toDF("log_bleu_micro", "hyp", "ref"), "log_bleu_micro",
        "hyp", "ref")
    }
    assert(e4.getMessage.contains("collides"))
    val e5 = intercept[IllegalArgumentException] {
      EvalMetrics.distinctN(Seq(("g", "a"))
        .toDF("distinct_ppm", "text"), "distinct_ppm", "text")
    }
    assert(e5.getMessage.contains("collides"))
    val e6 = intercept[IllegalArgumentException] {
      EvalMetrics.rougeL(Seq((1L, "a", "a"))
        .toDF("rouge_l_ppm", "hyp", "ref"), "rouge_l_ppm", "hyp", "ref")
    }
    assert(e6.getMessage.contains("collides"))
    val e7 = intercept[IllegalArgumentException] {
      EvalMetrics.distinctNApprox(Seq(("g", "a"))
        .toDF("est_q", "text"), "est_q", "text")
    }
    assert(e7.getMessage.contains("collides"))
  }

  test("embedFrechetDiag: identical corpora score 0; hand-computed " +
      "mean-only and variance-only shifts; ragged and mismatched " +
      "dims fail in-plan") {
    import spark.implicits._
    def df(rows: Seq[Seq[Double]]) =
      rows.toDF("embedding")
    def run(a: Seq[Seq[Double]], b: Seq[Seq[Double]]) =
      EvalMetrics.embedFrechetDiag(df(a), df(b), "embedding")
        .collect().head
    val same = run(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)),
      Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    assert(same.getAs[Long]("fd_micro") == 0L &&
      same.getAs[Long]("dims") == 2L, same.toString)
    // pure mean shift: A dims (μ=2, μ=0), B dims (μ=3, μ=1), all
    // variances equal per dim -> mean term = (1² + 1²)·10⁶, var 0
    val shift = run(Seq(Seq(1.0, 0.0), Seq(3.0, 0.0)),
      Seq(Seq(2.0, 1.0), Seq(4.0, 1.0)))
    assert(shift.getAs[Long]("mean_term_micro") == 2000000L,
      shift.toString)
    assert(shift.getAs[Long]("var_term_micro") == 0L)
    assert(shift.getAs[Long]("fd_micro") == 2000000L)
    assert(shift.getAs[Long]("n_a") == 2L &&
      shift.getAs[Long]("n_b") == 2L)
    // pure spread shift: same means (1), sd 1 vs 0 -> var term 10⁶
    val spread = run(Seq(Seq(0.0), Seq(2.0)), Seq(Seq(1.0), Seq(1.0)))
    assert(spread.getAs[Long]("mean_term_micro") == 0L, spread.toString)
    assert(spread.getAs[Long]("var_term_micro") == 1000000L)
    // null vectors are dropped, not scored
    val withNull = EvalMetrics.embedFrechetDiag(
      Seq(Some(Seq(0.0)), Some(Seq(2.0)), None).toDF("embedding"),
      df(Seq(Seq(1.0), Seq(1.0))), "embedding").collect().head
    assert(withNull.getAs[Long]("n_a") == 2L &&
      withNull.getAs[Long]("var_term_micro") == 1000000L)
    // a null ELEMENT inside a vector fails loudly (r14 advice): the
    // row would count toward n while the sums skip the null — a
    // silent moment skew the ragged guard cannot see
    val nullElem = intercept[Exception] {
      EvalMetrics.embedFrechetDiag(
        Seq(Seq(Some(0.0), Some(1.0)), Seq(Some(2.0), None))
          .toDF("embedding"),
        df(Seq(Seq(1.0, 1.0), Seq(1.0, 1.0))), "embedding").collect()
    }
    assert((nullElem.getMessage + Option(nullElem.getCause)
      .map(_.getMessage).getOrElse("")).contains("null element"),
      nullElem.getMessage)
    // ragged side: per-dim counts disagree (B carries both dims, so
    // this exercises the count guard, not the width guard) -> in-plan
    // failure
    val rag = intercept[Exception] {
      run(Seq(Seq(1.0), Seq(1.0, 2.0)),
        Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))
    }
    assert((rag.getMessage + Option(rag.getCause).map(_.getMessage)
      .getOrElse("")).contains("ragged"), rag.getMessage)
    // mismatched widths: a dimension on one side only -> failure
    val mis = intercept[Exception] {
      run(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)), Seq(Seq(1.0), Seq(2.0)))
    }
    assert((mis.getMessage + Option(mis.getCause).map(_.getMessage)
      .getOrElse("")).contains("dims"), mis.getMessage)
    // empty inputs get their OWN diagnostic, not the ragged one
    val empty = intercept[Exception] {
      run(Seq.empty, Seq.empty)
    }
    assert((empty.getMessage + Option(empty.getCause).map(_.getMessage)
      .getOrElse("")).contains("empty"), empty.getMessage)
    val oneEmpty = intercept[Exception] {
      run(Seq.empty, Seq(Seq(1.0), Seq(2.0)))
    }
    assert((oneEmpty.getMessage + Option(oneEmpty.getCause)
      .map(_.getMessage).getOrElse("")).contains("empty side"),
      oneEmpty.getMessage)
  }

  test("distinctNApprox: HLL estimates track the exact distinct-n " +
      "within the sketch's error bound on the corpus, totals match " +
      "exactly, and register state is bounded") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .where(col("text").isNotNull)
    val exact = EvalMetrics.distinctN(docs, "source", "text")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("n")) ->
        (r.getAs[Long]("total_ngrams"), r.getAs[Long]("distinct_ngrams")))
      .toMap
    val approx = EvalMetrics.distinctNApprox(docs, "source", "text")
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("n")) ->
        (r.getAs[Long]("total_ngrams"), r.getAs[Long]("est_q"),
          r.getAs[Long]("n_present")))
      .toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (tot, est, nPresent)) =>
      val (exTot, exDistinct) = exact(k)
      assert(tot == exTot, s"$k: totals must be exact ($tot != $exTot)")
      // sigma ~= 1.6% at m = 4096; 6 sigma leaves the test stable while
      // still catching a broken register pipeline (off by 2x+)
      val tol = math.max(0.10 * exDistinct, 8.0)
      assert(math.abs(est - exDistinct) <= tol,
        s"$k: est $est vs exact $exDistinct")
      assert(nPresent <= 4096L)
    }
  }

  test("distinct-n: hand-computed ratios; documents shorter than the " +
      "order contribute no phantom n-grams") {
    import spark.implicits._
    val got = EvalMetrics.distinctN(Seq(
        ("g", "a a b"), ("g", "a b"),
        ("h", "x"))                    // 1 token: no 2/3-grams at all
      .toDF("src", "text"), "src", "text")
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Int]("n")) ->
        (r.getAs[Long]("total_ngrams"), r.getAs[Long]("distinct_ngrams"),
          r.getAs[Long]("distinct_ppm"))).toMap
    // g order 1: tokens a,a,b,a,b -> 5 total, 2 distinct
    assert(got(("g", 1)) == ((5L, 2L, 400000L)), got.toString)
    // g order 2: "a a","a b" + "a b" -> 3 total, 2 distinct
    assert(got(("g", 2)) == ((3L, 2L, 666666L)))
    // g order 3: only the first doc is long enough -> 1/1
    assert(got(("g", 3)) == ((1L, 1L, 1000000L)))
    assert(got(("h", 1)) == ((1L, 1L, 1000000L)))
    assert(!got.contains(("h", 2)) && !got.contains(("h", 3)),
      "no denominator -> no row (the cer empty-ref convention)")
  }
}
