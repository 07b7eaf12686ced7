package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted

/** Unigram-language-model tokenizer (Kudo 2018, "Subword Regularization:
  * Improving Neural Network Translation Models with Multiple Subword
  * Candidates" — the SentencePiece `unigram` algorithm), restructured for
  * Spark's execution model alongside the BPE pipeline in [[Tokenizer]].
  *
  * Scale design mirrors [[Tokenizer.bpeTrain]]: the corpus reduces ONCE
  * to a weighted word vocabulary (the only corpus-sized shuffle, with
  * map-side combine), and everything after runs on vocab-sized frames:
  *
  *  - seed vocabulary = frequent substrings of the (marked) words, a
  *    vocab-local substring explode + re-agg (SQL-expressible — the
  *    q_sp_vocab oracle replays it);
  *  - each EM iteration is one vocab-sized job: segment the DISTINCT
  *    words under a broadcast piece-score table, aggregate per-piece
  *    counts, collect the ≤ seed-sized count table to the driver,
  *    update scores. BOTH E-steps are implemented: hard-EM (Viterbi
  *    counts — the default; exact-integer statistics, oracle-replayable)
  *    and soft-EM (forward–backward expectations per [[expectedCounts]]
  *    — the SentencePiece tool's E-step, 1e-9-quantized before the
  *    distributed sum so training stays partitioning-deterministic);
  *  - pruning keeps all single characters (the paper's coverage
  *    invariant) and drops the lowest-count multi-char pieces until the
  *    target vocab size is reached.
  *
  * Words are prefixed with the SentencePiece word-boundary marker '▁'
  * (U+2581), so decode is marker-driven: concatenate pieces, turn '▁'
  * into spaces, trim — `decode(encode(docs)) ==` the whitespace-
  * normalized lower-cased corpus exactly (the q_sp_roundtrip gate,
  * q_bpe_roundtrip's discipline). A corpus word containing the literal
  * marker would corrupt reassembly — the standard SentencePiece
  * collision, inherited from the scheme.
  *
  * Determinism: Viterbi ties break to the longest final piece (strict
  * `>` over ascending split points); EM counts are exact integer sums;
  * score updates happen in one driver pass; pruning cuts on the total
  * order (count desc, piece asc). Training is therefore bit-identical
  * under any partitioning.
  */
object UnigramLm {

  val Marker = "▁"

  /** Trained model: `pieces` ranked by (count desc, piece asc) carrying
    * (piece, viterbi count, log-prob). Ids are the rank + 1; 0 = unk. */
  case class Model(pieces: Seq[(String, Long, Double)], maxPieceLen: Int) {
    lazy val scores: Map[String, Double] =
      pieces.map(p => p._1 -> p._3).toMap
    lazy val ids: Map[String, Int] =
      pieces.zipWithIndex.map { case (p, i) => p._1 -> (i + 1) }.toMap
    lazy val byId: Map[Int, String] =
      ids.map { case (p, i) => i -> p }
  }

  /** Marked word vocabulary: ('▁'+word, freq) — [[Tokenizer.wordFreq]]
    * plus the boundary marker. */
  def markedWordFreq(docs: DataFrame, textCol: String): DataFrame =
    Tokenizer.wordFreq(docs, textCol)
      .select(concat(lit(Marker), col("word")).as("word"), col("freq"))

  /** Seed vocabulary: every substring of length 1..maxPieceLen of every
    * marked word, weighted by Σ word-freq over occurrence positions —
    * all single characters (coverage) plus the top `multiSeeds`
    * multi-char candidates by (weight × length desc, piece asc), a
    * total-ordered engine-portable cut (the bpePairCounts discipline).
    * Emits (piece, w, is_char). */
  def seedVocab(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      multiSeeds: Int = 1000): DataFrame = {
    val subs = markedWordFreq(docs, textCol)
      .select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1),
            least(lit(maxPieceLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("piece"))
      .groupBy("piece").agg(sum("freq").as("w"))
      .persistTracked
    val chars = subs.where(length(col("piece")) === 1)
      .select(col("piece"), col("w"), lit(true).as("is_char"))
    val multi = subs.where(length(col("piece")) >= 2)
      .orderBy((col("w") * length(col("piece"))).desc, col("piece"))
      .limit(multiSeeds)
      .select(col("piece"), col("w"), lit(false).as("is_char"))
    chars.unionByName(multi)
  }

  /** Viterbi segmentation of one marked word: maximize Σ log p(piece)
    * over all segmentations into known pieces; unknown single chars get
    * `unkScore` (coverage fallback — every word stays segmentable). Ties
    * break to the smallest split point, i.e. the longest final piece —
    * deterministic. Shared by training (hard-EM counts) and [[encode]].
    */
  def viterbi(word: String, scores: Map[String, Double], maxPieceLen: Int,
      unkScore: Double = -100.0): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    dp(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val s = scores.get(word.substring(i, j)) match {
          case Some(x) => x
          case None => if (j - i == 1) unkScore else Double.NegativeInfinity
        }
        if (s > Double.NegativeInfinity && dp(i) + s > dp(j)) {
          dp(j) = dp(i) + s
          back(j) = i
        }
        i += 1
      }
      j += 1
    }
    var out = List.empty[String]
    var p = n
    while (p > 0) { out ::= word.substring(back(p), p); p = back(p) }
    out
  }

  /** Forward–backward expected piece counts of one marked word — the
    * SOFT-EM E-step of Kudo 2018 §3.2 (the computation the SentencePiece
    * tool runs; [[viterbi]] counts are the hard-EM variant this library
    * defaults to for bit-exact oracle replay). Over the segmentation
    * lattice with edge scores log p(piece) (unknown single chars get
    * `unkScore`, the [[viterbi]] coverage fallback):
    *
    *   α(0)=0, α(j)=logΣ_i exp(α(i)+s(i,j));  β(n)=0 symmetric;
    *   E[piece (i,j)] = exp(α(i)+s(i,j)+β(j) − α(n))
    *
    * summed per distinct piece string. Emitted QUANTIZED —
    * (piece, floor(E·10⁹)) — so the distributed freq-weighted
    * aggregation sums exact integers and commutes under any partitioning
    * (the q_bm25 discipline applied to EM statistics); the fixed
    * accumulation order inside the lattice makes the pre-quantization
    * doubles themselves run-stable. */
  def expectedCounts(word: String, scores: Map[String, Double],
      maxPieceLen: Int, unkScore: Double = -100.0): Seq[(String, Long)] = {
    val n = word.length
    if (n == 0) return Nil
    val neg = Double.NegativeInfinity
    def edge(i: Int, j: Int): Double =
      scores.get(word.substring(i, j)) match {
        case Some(x) => x
        case None => if (j - i == 1) unkScore else neg
      }
    def logAdd(a: Double, b: Double): Double =
      if (a == neg) b
      else if (b == neg) a
      else { val hi = math.max(a, b); val lo = math.min(a, b)
        hi + math.log1p(math.exp(lo - hi)) }
    val alpha = Array.fill(n + 1)(neg)
    alpha(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val s = edge(i, j)
        if (s > neg && alpha(i) > neg)
          alpha(j) = logAdd(alpha(j), alpha(i) + s)
        i += 1
      }
      j += 1
    }
    val z = alpha(n)
    if (z == neg) return Nil // unsegmentable (impossible under coverage)
    val beta = Array.fill(n + 1)(neg)
    beta(n) = 0.0
    var i2 = n - 1
    while (i2 >= 0) {
      var j2 = i2 + 1
      val jMax = math.min(n, i2 + maxPieceLen)
      while (j2 <= jMax) {
        val s = edge(i2, j2)
        if (s > neg && beta(j2) > neg)
          beta(i2) = logAdd(beta(i2), s + beta(j2))
        j2 += 1
      }
      i2 -= 1
    }
    // accumulate per piece in lattice order (deterministic map order)
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var i3 = 0
    while (i3 < n) {
      var j3 = i3 + 1
      val jMax = math.min(n, i3 + maxPieceLen)
      while (j3 <= jMax) {
        val s = edge(i3, j3)
        if (s > neg && alpha(i3) > neg && beta(j3) > neg) {
          val e = math.exp(alpha(i3) + s + beta(j3) - z)
          val p = word.substring(i3, j3)
          acc.update(p, acc.getOrElse(p, 0.0) + e)
        }
        j3 += 1
      }
      i3 += 1
    }
    // drop zero-quantized entries: a (piece, 0) row adds nothing to the
    // aggregation and would otherwise shadow the M-step's coverage floor
    acc.toSeq.map { case (p, e) => (p, math.floor(e * 1e9).toLong) }
      .filter(_._2 > 0L)
  }

  /** Train a unigram-LM vocabulary of ≤ `vocabSize` pieces (all single
    * chars always included). `emIters` EM rounds per prune cycle;
    * `pruneFrac` of surviving multi-char pieces dropped per cycle until
    * the target size is reached, then one final EM settles the scores.
    * `emMode` picks the E-step: `"hard"` (default — Viterbi counts,
    * exact-integer statistics, bit-identical under any partitioning, the
    * q_sp_roundtrip oracle's replayable variant) or `"soft"` (full
    * forward–backward expectations per [[expectedCounts]] — the
    * SentencePiece tool's E-step; expectations are 1e-9-quantized before
    * the distributed sum so training stays partitioning-deterministic,
    * and ambiguous pieces receive fractional mass instead of
    * winner-take-all). Inference ([[encode]]) is Viterbi in both modes,
    * matching SentencePiece's default decode. */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 400,
      emIters: Int = 2, maxPieceLen: Int = 4, multiSeeds: Int = 1000,
      pruneFrac: Double = 0.25, emMode: String = "hard"): Model = {
    require(emMode == "hard" || emMode == "soft",
      s"emMode must be 'hard' or 'soft': $emMode")
    val spark = docs.sparkSession
    val words = markedWordFreq(docs, textCol)
      .persistTracked
    try {
      val seed = seedVocab(docs, textCol, maxPieceLen, multiSeeds)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // init scores from seed weights (normalized log-likelihoods)
      var pieces: Map[String, Double] = {
        val total = seed.map(_._2).sum.toDouble
        seed.map { case (p, w) => p -> math.log(w / total) }.toMap
      }
      var counts: Map[String, Double] =
        seed.toMap.view.mapValues(_ => 0.0).toMap

      def emRound(): Map[String, Double] = {
        val bc = spark.sparkContext.broadcast(pieces)
        val out =
          if (emMode == "soft") {
            // freq × quantized expectation as DECIMAL(38,0): exact,
            // commutative, and no Long overflow however big freq·1e9
            // grows (the epochPlan overflow lesson)
            val expU = udf { (w: String) =>
              expectedCounts(w, bc.value, maxPieceLen)
            }
            words
              .select(col("freq"), explode(expU(col("word"))).as("e"))
              .select(col("e._1").as("piece"),
                (col("freq").cast("decimal(38,0)") * col("e._2"))
                  .as("wq"))
              .groupBy("piece")
              .agg(sum("wq").as("n"))
              .collect()
              .map(r => r.getString(0) ->
                r.getDecimal(1).doubleValue() / 1e9)
              .toMap
          } else {
            val segU = udf { (w: String) =>
              viterbi(w, bc.value, maxPieceLen)
            }
            words
              .select(col("freq"), explode(segU(col("word"))).as("piece"))
              .groupBy("piece").agg(sum("freq").as("n"))
              .collect()
              .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
          }
        bc.destroy()
        out
      }
      def mStep(c: Map[String, Double]): Unit = {
        counts = c
        val total = math.max(1.0, c.values.sum)
        // unused pieces keep a floor score only if single chars
        // (coverage); unused multi-char pieces drop out here. A
        // quantized-to-zero SOFT expectation counts as unused — mapping
        // it through log(0/total) = −Inf would permanently disable the
        // piece (and for a single char break the coverage invariant)
        pieces = pieces.flatMap { case (p, _) =>
          c.get(p) match {
            case Some(n) if n > 0 => Some(p -> math.log(n / total))
            case _ if p.length == 1 => Some(p -> math.log(0.5 / total))
            case _ => None
          }
        }
      }

      var target = false
      while (!target) {
        var it = 0
        while (it < emIters) { mStep(emRound()); it += 1 }
        val multi = pieces.keys.filter(_.length > 1)
        val nChars = pieces.size - multi.size
        if (pieces.size <= vocabSize) target = true
        else {
          val keepN =
            math.max(vocabSize - nChars, (multi.size * (1 - pruneFrac)).toInt)
          val kept = multi.toSeq
            .sortBy(p => (-counts.getOrElse(p, 0.0), p))
            .take(keepN).toSet
          pieces = pieces.filter { case (p, _) =>
            p.length == 1 || kept(p) }
          if (keepN == multi.size) target = true // cannot shrink further
        }
      }
      mStep(emRound()) // settle scores on the final vocabulary
      // Model carries Long counts: exact in hard mode (integral
      // doubles), nearest-integer of the expectation in soft mode
      val ranked = pieces.keys.toSeq
        .map(p => (p, counts.getOrElse(p, 0.0), pieces(p)))
        .sortBy { case (p, n, _) => (-n, p) }
        .map { case (p, n, s) => (p, math.floor(n + 0.5).toLong, s) }
      Model(ranked, maxPieceLen)
    } finally { words.unpersist(); () }
  }

  /** (subword, tok_id) frame of the model's deterministic id ranking —
    * the unigram twin of [[Tokenizer.vocabulary]] (model is driver-side
    * and bounded by vocabSize, so this is a local relation). */
  def vocabularyDf(spark: SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    model.pieces.zipWithIndex
      .map { case ((p, _, _), i) => (p, i + 1) }
      .toDF("subword", "tok_id")
  }

  /** Text → token-id sequences under a trained model: Viterbi-segment
    * the DISTINCT marked words (vocab-sized), broadcast-join back, gather
    * per doc with explicit (word idx, piece idx) keys — the
    * [[Tokenizer.encode]] plan with the marker convention. Returns
    * (idCol, input_ids: array<int>). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: Model, unkId: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val segU = udf { (w: String) =>
      viterbi(w, bc.value.scores, bc.value.maxPieceLen)
    }
    val words = docs
      .select(col(idCol), posexplode(filter(
        split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)))
      .withColumnRenamed("pos", "_widx")
      .select(col(idCol), col("_widx"),
        concat(lit(Marker), col("col")).as("word"))
    val vocabSeg = words.select("word").distinct()
      .withColumn("pieces", segU(col("word")))
    // broadcast-to-keyed fallback past ~5M distinct words (Tokenizer's
    // shared threshold) — same join-back shape as segmentCorpus
    Tokenizer.joinByWord(words, vocabSeg)
      .select(col(idCol), col("_widx"), posexplode(col("pieces")))
      .withColumnRenamed("pos", "_sidx")
      .withColumnRenamed("col", "subword")
      .join(broadcast(vocabularyDf(spark, model)), Seq("subword"), "left")
      .select(col(idCol), col("_widx"), col("_sidx"),
        coalesce(col("tok_id"), lit(unkId)).as("tok_id"))
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("_widx"), col("_sidx"),
          col("tok_id")))),
        x => x.getField("tok_id").cast("int")).as("input_ids"))
  }

  /** Token-id sequences → text: ids join back to pieces (broadcast),
    * order restored by position key, pieces concatenate and markers
    * become spaces — the exact inverse of [[encode]] for any corpus the
    * model's single-char coverage spans. Returns (idCol, text). */
  def decode(encoded: DataFrame, idCol: String, idsCol: String,
      model: Model): DataFrame = {
    val spark = encoded.sparkSession
    val pos = encoded
      .select(col(idCol), posexplode(col(idsCol)))
      .withColumnRenamed("pos", "_p")
      .withColumnRenamed("col", "tok_id")
    pos.join(broadcast(vocabularyDf(spark, model)), Seq("tok_id"))
      .groupBy(idCol)
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("_p"), col("subword")))),
        x => x.getField("subword"))).as("_joined"))
      .select(col(idCol),
        trim(replace(col("_joined"), lit(Marker), lit(" "))).as("text"))
  }
}
