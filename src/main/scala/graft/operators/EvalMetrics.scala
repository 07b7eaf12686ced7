package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Generation-evaluation metrics — the GENERATION leg of the eval
  * family ([[Relevance.rankingMetrics]] is the retrieval leg): chrF
  * (Popović 2015, "chrF: character n-gram F-score for automatic MT
  * evaluation"), character error rate over the engines' native
  * Levenshtein, and distinct-n diversity (Li et al. 2016, "A
  * Diversity-Promoting Objective Function for Neural Conversation
  * Models") — the scoring a synthetic-data / distillation pipeline
  * runs over (hypothesis, reference) pairs and generated corpora.
  *
  * Reference scope: the reference engine has no generation-eval
  * operator — this is part of the beyond-parity LLM-pipeline family.
  *
  * Engine-exact discipline: chrF is chosen over BLEU precisely
  * because it is TRANSCENDENTAL-FREE — BLEU's geometric mean and
  * brevity penalty need exp/ln, which no two engines round alike,
  * while chrF's F-score is a rational function. Per-order precision
  * and recall quantize to ppm integer divisions FIRST; the order
  * average and the F-score are integer arithmetic over those
  * quantized values, so no float ever accumulates across rows and
  * the SQL oracle replays every metric bit-for-bit. CER rides
  * `levenshtein`, the same plain unit-cost edit distance in Spark
  * and DuckDB.
  *
  * Scale shape: every metric is one narrow per-row gram expansion
  * (higher-order functions, no UDF) followed by keyed two-phase
  * aggregation — pair-bounded or corpus-bounded work, no all-pairs
  * stage anywhere.
  */
object EvalMetrics {

  /** The groupAdvantages/kAnonymize collision convention: an id or
    * group column named like one of the metric's OUTPUT columns would
    * either be silently shadowed or raise a confusing duplicate-name
    * AnalysisException deep in the plan — fail fast with the actual
    * contract instead. */
  private def requireNoCollision(role: String, name: String,
      outputs: Seq[String]): Unit =
    require(!outputs.contains(name),
      s"$role column '$name' collides with an output column " +
        s"(${outputs.mkString(", ")}) of this metric — rename it first")

  /** Multiset character n-grams of all orders 1..maxOrder as
    * (n, g) structs — whitespace REMOVED first (Popović's chrF
    * convention: spaces carry no content signal and double-count
    * word boundaries). `sequence(1, greatest(len-n+1, 1))` keeps the
    * sequence ascending for strings shorter than n (Spark steps DOWN
    * when start > stop — the renderConversation lesson); the
    * out-of-range probe gram that guard mints is dropped by the
    * exact-length filter. */
  private def charGrams(c: Column, maxOrder: Int): Column = {
    val s = regexp_replace(c, "\\s+", "")
    filter(
      flatten(transform(sequence(lit(1), lit(maxOrder)), n =>
        transform(sequence(lit(1), greatest(length(s) - n + 1, lit(1))),
          i => struct(n.as("n"), s.substr(i, n).as("g"))))),
      st => length(st("g")) === st("n"))
  }

  /** chrF per (hypothesis, reference) pair: character-n-gram
    * precision/recall with MULTISET (clipped-count) matching per
    * order 1..maxOrder, ppm-quantized per order, averaged over ALL
    * maxOrder orders (orders where a side has no grams contribute 0
    * — the short-string convention, documented rather than silently
    * skipped), and the F_β score over the quantized averages:
    *
    *   chrf_ppm = (1+β²)·avgP·avgR div (β²·avgP + avgR)
    *
    * Pairs where NEITHER side yields a gram (both texts whitespace-
    * only) emit all-zero metrics rather than vanishing — an eval
    * harness must account for every pair it was given.
    *
    * Plan: a PURE NARROW PROJECTION — zero shuffles at any corpus
    * size. The per-order clipped match count is the native codegen'd
    * [[graft.plans.CharNgramMatchesExpression]] (sort + two-pointer
    * over code-point n-grams, row-local), the totals are length
    * arithmetic, and the order average + F-score are plain integer
    * column expressions. chrF is per-pair arithmetic, so the
    * alternative — exploding 6·len gram rows per side through a
    * keyed aggregation only to reduce them straight back to one row
    * per pair — moves the entire gram volume through an Exchange for
    * nothing; that dataflow is kept as [[chrFViaAgg]], the
    * bit-identity cross-check (the VectorExpressions native-vs-HOF
    * convention).
    *
    * @return (idCol, prec_ppm, rec_ppm, chrf_ppm) — one row per
    *         input pair */
  def chrF(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String, maxOrder: Int = 6, beta2: Int = 4): DataFrame = {
    require(maxOrder >= 1 && maxOrder <= 12,
      s"maxOrder=$maxOrder outside [1, 12]")
    require(beta2 >= 0, s"beta2=$beta2 must be >= 0")
    requireNoCollision("id", idCol,
      Seq("prec_ppm", "rec_ppm", "chrf_ppm", "_hs", "_rs") ++
        (1 to maxOrder).flatMap(n =>
          Seq(s"_m$n", s"_ht$n", s"_rt$n")))
    graft.plans.GraftExtensions.register(pairs.sparkSession)
    val base = pairs.select(col(idCol).as("id"),
      regexp_replace(col(hypCol), "\\s+", "").as("_hs"),
      regexp_replace(col(refCol), "\\s+", "").as("_rs"))
    val withCounts = base.select(Seq(col("id")) ++
      (1 to maxOrder).flatMap { n =>
        Seq(
          graft.plans.CharNgramMatchesExpression
            .matchesNative(col("_hs"), col("_rs"), n).as(s"_m$n"),
          greatest(length(col("_hs")) - (n - 1), lit(0)).cast("long")
            .as(s"_ht$n"),
          greatest(length(col("_rs")) - (n - 1), lit(0)).cast("long")
            .as(s"_rt$n"))
      }: _*)
    def terms(tot: String) = (1 to maxOrder).map(n =>
      s"(CASE WHEN $tot$n = 0 THEN 0L " +
        s"ELSE _m$n * 1000000L div $tot$n END)").mkString(" + ")
    withCounts.select(col("id").as(idCol),
        // null texts yield null counts end to end -> all-zero metrics,
        // the same row the agg form's left join + coalesce produces
        coalesce(expr(s"(${terms("_ht")}) div ${maxOrder}L"), lit(0L))
          .as("prec_ppm"),
        coalesce(expr(s"(${terms("_rt")}) div ${maxOrder}L"), lit(0L))
          .as("rec_ppm"))
      .withColumn("chrf_ppm",
        when(expr(s"${beta2}L * prec_ppm + rec_ppm") === 0, lit(0L))
          .otherwise(expr(s"(${1 + beta2}L * prec_ppm * rec_ppm) div " +
            s"(${beta2}L * prec_ppm + rec_ppm)")))
  }

  /** The exploded-aggregation chrF dataflow — kept as the
    * bit-identity cross-check for [[chrF]]'s native kernel
    * (EvalMetricsSpec pins equality on the corpus): BOTH sides'
    * grams union into one side-tagged exploded frame (union is
    * narrow) → ONE per-(id, n, gram) two-phase agg carrying both
    * multiplicities (clipped match = least of the two — a gram
    * absent from a side reads 0, so no join is needed at all) →
    * per-(id, n) agg → per-id agg. */
  private[graft] def chrFViaAgg(pairs: DataFrame, idCol: String,
      hypCol: String, refCol: String, maxOrder: Int = 6,
      beta2: Int = 4): DataFrame = {
    require(maxOrder >= 1 && maxOrder <= 12,
      s"maxOrder=$maxOrder outside [1, 12]")
    require(beta2 >= 0, s"beta2=$beta2 must be >= 0")
    // the aggregation keys on id, so a DUPLICATE id would silently
    // pool two pairs' gram multisets and void the bit-identity
    // cross-check contract with the per-row native form — fail the
    // job instead (the merge duplicate-source-key convention)
    val dupW = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val base = pairs.select(col(idCol).as("id"),
        col(hypCol).as("h"), col(refCol).as("r"))
      .withColumn("_idc", count(lit(1)).over(dupW))
      .withColumn("id", when(col("_idc") === 1, col("id"))
        .otherwise(raise_error(concat(
          lit("chrFViaAgg: duplicate pair id "),
          coalesce(col("id").cast("string"), lit("null")),
          lit(" — the agg cross-check pools grams per id; use unique " +
            "ids")))
          .cast(pairs.schema(pairs.columns.indexOf(idCol)).dataType)))
      .drop("_idc")
    def side(c: Column, wh: Int, wr: Int) =
      base.select(col("id"), lit(wh.toLong).as("wh"),
        lit(wr.toLong).as("wr"), explode(charGrams(c, maxOrder)).as("s"))
    val perOrder = side(col("h"), 1, 0)
      .unionByName(side(col("r"), 0, 1))
      .groupBy(col("id"), col("s.n").as("n"), col("s.g").as("g"))
      .agg(sum("wh").as("ch"), sum("wr").as("cr"))
      .groupBy("id", "n")
      .agg(sum(least(col("ch"), col("cr"))).as("m"),
        sum(col("ch")).as("ht"), sum(col("cr")).as("rt"))
      .select(col("id"),
        // explicit zero-denominator branches: ANSI div throws on /0,
        // and a side can have zero grams of an order the other side
        // has (hyp shorter than n, ref not)
        when(col("ht") === 0, lit(0L))
          .otherwise(expr("m * 1000000L div ht")).as("p"),
        when(col("rt") === 0, lit(0L))
          .otherwise(expr("m * 1000000L div rt")).as("q"))
    base.select(col("id")).join(
        perOrder.groupBy("id").agg(
          expr(s"sum(p) div ${maxOrder}L").as("prec_ppm"),
          expr(s"sum(q) div ${maxOrder}L").as("rec_ppm")),
        Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("prec_ppm"), lit(0L)).as("prec_ppm"),
        coalesce(col("rec_ppm"), lit(0L)).as("rec_ppm"))
      .withColumn("chrf_ppm",
        when(expr(s"${beta2}L * prec_ppm + rec_ppm") === 0, lit(0L))
          .otherwise(expr(s"(${1 + beta2}L * prec_ppm * rec_ppm) div " +
            s"(${beta2}L * prec_ppm + rec_ppm)")))
  }

  /** SQuAD-style token F1 per (hypothesis, reference) pair: clipped
    * multiset overlap of lowercased whitespace tokens (the span-answer
    * scoring every QA / distillation eval reports beside exact match):
    *
    *   prec_ppm = m·10⁶ div |hyp|; rec_ppm = m·10⁶ div |ref|;
    *   f1_ppm   = 2·P·R div (P + R)
    *
    * where m = Σ_t min(count_hyp(t), count_ref(t)) — the native
    * row-local [[graft.plans.ArrayClippedMatchesExpression]] kernel,
    * so the whole metric is a zero-shuffle narrow projection (the
    * [[chrF]] argument at token grain). Normalization is lowercase +
    * whitespace split, documented rather than SQuAD's English-specific
    * article stripping (language-neutral corpora). A side with zero
    * tokens contributes zero P/R (and F1 0); every input pair emits a
    * row.
    *
    * @return (idCol, n_match, n_hyp, n_ref, prec_ppm, rec_ppm,
    *         f1_ppm) */
  def tokenF1(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String): DataFrame = {
    requireNoCollision("id", idCol, Seq("n_match", "n_hyp", "n_ref",
      "prec_ppm", "rec_ppm", "f1_ppm", "_ht", "_rt"))
    graft.plans.GraftExtensions.register(pairs.sparkSession)
    def toks(c: Column) =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    pairs.select(col(idCol).as(idCol),
        toks(col(hypCol)).as("_ht"), toks(col(refCol)).as("_rt"))
      .select(col(idCol),
        coalesce(graft.plans.ArrayClippedMatchesExpression
          .matchesNative(col("_ht"), col("_rt")), lit(0L)).as("n_match"),
        coalesce(size(col("_ht")).cast("long"), lit(0L)).as("n_hyp"),
        coalesce(size(col("_rt")).cast("long"), lit(0L)).as("n_ref"))
      .select(col(idCol), col("n_match"),
        greatest(col("n_hyp"), lit(0L)).as("n_hyp"),
        greatest(col("n_ref"), lit(0L)).as("n_ref"))
      .withColumn("prec_ppm", when(col("n_hyp") === 0, lit(0L))
        .otherwise(expr("n_match * 1000000L div n_hyp")))
      .withColumn("rec_ppm", when(col("n_ref") === 0, lit(0L))
        .otherwise(expr("n_match * 1000000L div n_ref")))
      .withColumn("f1_ppm",
        when(expr("prec_ppm + rec_ppm") === 0, lit(0L))
          .otherwise(expr(
            "2L * prec_ppm * rec_ppm div (prec_ppm + rec_ppm)")))
  }

  /** ROUGE-N per (hypothesis, reference) pair (Lin 2004): clipped
    * token n-gram overlap P/R/F1 — [[tokenF1]]'s clipped-multiset
    * scoring lifted from unigrams to order-n grams (ROUGE-1 ≡
    * tokenF1's P/R/F on the same normalization), completing the
    * reported trio next to [[rougeL]]. F1 (the rouge-score library
    * convention) with the P/R columns exposed for re-weighting;
    * ppm integer arithmetic throughout, zero-gram sides score 0 and
    * still emit a row (the tokenF1 convention).
    *
    * Plan: the same zero-shuffle narrow projection — in-row gram
    * arrays through the native `array_clipped_matches` kernel.
    *
    * @return (idCol, n_match, n_hyp_grams, n_ref_grams, prec_ppm,
    *         rec_ppm, f1_ppm) */
  def rougeN(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String, n: Int = 2): DataFrame = {
    require(n >= 1 && n <= 8, s"n=$n outside [1, 8]")
    requireNoCollision("id", idCol, Seq("n_match", "n_hyp_grams",
      "n_ref_grams", "prec_ppm", "rec_ppm", "f1_ppm", "_hg", "_rg"))
    graft.plans.GraftExtensions.register(pairs.sparkSession)
    def toks(c: Column) =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    pairs.select(col(idCol).as(idCol),
        tokenGrams(toks(col(hypCol)), n).as("_hg"),
        tokenGrams(toks(col(refCol)), n).as("_rg"))
      .select(col(idCol),
        coalesce(graft.plans.ArrayClippedMatchesExpression
          .matchesNative(col("_hg"), col("_rg")), lit(0L)).as("n_match"),
        coalesce(size(col("_hg")).cast("long"), lit(0L))
          .as("n_hyp_grams"),
        coalesce(size(col("_rg")).cast("long"), lit(0L))
          .as("n_ref_grams"))
      .select(col(idCol), col("n_match"),
        greatest(col("n_hyp_grams"), lit(0L)).as("n_hyp_grams"),
        greatest(col("n_ref_grams"), lit(0L)).as("n_ref_grams"))
      .withColumn("prec_ppm", when(col("n_hyp_grams") === 0, lit(0L))
        .otherwise(expr("n_match * 1000000L div n_hyp_grams")))
      .withColumn("rec_ppm", when(col("n_ref_grams") === 0, lit(0L))
        .otherwise(expr("n_match * 1000000L div n_ref_grams")))
      .withColumn("f1_ppm",
        when(expr("prec_ppm + rec_ppm") === 0, lit(0L))
          .otherwise(expr(
            "2L * prec_ppm * rec_ppm div (prec_ppm + rec_ppm)")))
  }

  /** Word n-grams of a token array as space-joined strings — the
    * in-row gram builder [[rougeN]] and [[logBleu]] share (n = 1
    * returns the token array itself; the null-probe filter is the
    * charGrams short-string guard at token grain). */
  private def tokenGrams(c: Column, n: Int): Column =
    if (n == 1) c
    else filter(
      transform(sequence(lit(1), greatest(size(c) - (n - 1), lit(1))),
        i => when(size(c) - (n - 1) >= i,
          concat_ws(" ", slice(c, i, lit(n))))),
      g => g.isNotNull)

  /** Sentence BLEU in LOG space per pair (Papineni 2002), micro-
    * quantized: token n-gram clipped precisions for orders 1..maxOrder
    * with +1 smoothing (Lin & Och 2004 applied to every order — no
    * ln(0) exists), averaged over the EFFECTIVE orders (those where
    * the hypothesis has any n-gram — a 3-token hypothesis is not
    * graded on 4-grams), plus the log brevity penalty:
    *
    *   log_bleu = min(0, 1 − r/c) + (Σ_{eff n} ln((m_n+1)/(t_n+1)))
    *              / eff
    *
    * emitted as floor(log_bleu·10⁶). A perfect pair scores exactly 0;
    * more negative = worse. LOG space is deliberate: exp() never runs,
    * so the only transcendental is ln over identical IEEE doubles in
    * both engines — the proven q_tfidf / q_ccnet_bands floor(ln·10⁶)
    * discipline; exp would stack a second rounding layer on top.
    *
    * Pairs where either side has zero tokens are NOT emitted (no
    * n-gram precision exists — the [[cer]] empty-ref convention).
    * Same zero-shuffle narrow-projection shape as [[chrF]]/[[tokenF1]]
    * (the clipped counts are the native array kernel over in-row
    * n-gram arrays).
    *
    * @return (idCol, n_hyp, n_ref, log_bleu_micro) */
  def logBleu(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String, maxOrder: Int = 4): DataFrame = {
    require(maxOrder >= 1 && maxOrder <= 8,
      s"maxOrder=$maxOrder outside [1, 8]")
    requireNoCollision("id", idCol,
      Seq("n_hyp", "n_ref", "log_bleu_micro", "_ht", "_rt") ++
        (1 to maxOrder).flatMap(n => Seq(s"_m$n", s"_t$n")))
    graft.plans.GraftExtensions.register(pairs.sparkSession)
    def toks(c: Column) =
      filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)
    def grams(c: Column, n: Int) = tokenGrams(c, n)
    val base = pairs.select(col(idCol).as("id"),
        toks(col(hypCol)).as("_ht"), toks(col(refCol)).as("_rt"))
      .where(size(col("_ht")) > 0 && size(col("_rt")) > 0)
    val withCounts = base.select(Seq(col("id"),
      size(col("_ht")).cast("long").as("n_hyp"),
      size(col("_rt")).cast("long").as("n_ref")) ++
      (1 to maxOrder).flatMap { n =>
        Seq(
          graft.plans.ArrayClippedMatchesExpression.matchesNative(
            grams(col("_ht"), n), grams(col("_rt"), n)).as(s"_m$n"),
          greatest(size(col("_ht")) - (n - 1), lit(0)).cast("long")
            .as(s"_t$n"))
      }: _*)
    // ln terms and the effective-order count as ONE expression tree:
    // identical association order in Spark and DuckDB, so the double
    // arithmetic replays exactly
    val lnSum = (1 to maxOrder).map(n =>
      s"(CASE WHEN _t$n > 0 THEN " +
        s"ln(CAST(_m$n + 1L AS DOUBLE) / CAST(_t$n + 1L AS DOUBLE)) " +
        s"ELSE 0.0D END)").mkString(" + ")
    val eff = (1 to maxOrder).map(n =>
      s"(CASE WHEN _t$n > 0 THEN 1L ELSE 0L END)").mkString(" + ")
    withCounts.select(col("id").as(idCol), col("n_hyp"), col("n_ref"),
      expr(s"CAST(floor((least(0.0D, 1.0D - CAST(n_ref AS DOUBLE) / " +
        s"CAST(n_hyp AS DOUBLE)) + ($lnSum) / CAST(($eff) AS DOUBLE))" +
        s" * 1000000.0D) AS BIGINT)").as("log_bleu_micro"))
  }

  /** ROUGE-L per (hypothesis, reference) pair (Lin 2004, "ROUGE: A
    * Package for Automatic Evaluation of Summaries"): precision,
    * recall, and F1 of the longest common SUBSEQUENCE of lowercased
    * whitespace tokens — the most-reported summarization metric, and
    * the order-sensitive counterpart of [[tokenF1]]'s bag overlap:
    *
    *   prec_ppm    = lcs·10⁶ div |hyp|; rec_ppm = lcs·10⁶ div |ref|;
    *   rouge_l_ppm = 2·P·R div (P + R)
    *
    * F1 (β=1, the rouge-score library's convention) rather than
    * Lin's recall-weighted β→∞ variant, documented; the P/R columns
    * let a caller re-weight. LCS is an integer DP, so the whole
    * metric is transcendental-free ppm arithmetic — the SQL oracle
    * replays it bit-for-bit (a recursive-CTE row DP in prefix-max
    * form). A side with zero tokens contributes zero P/R (and F 0);
    * every input pair emits a row (the [[tokenF1]] convention).
    *
    * Plan: zero-shuffle narrow projection — the LCS is the native
    * row-local [[graft.plans.ArrayLcsLengthExpression]] kernel
    * (two-row integer DP, O(|hyp|·|ref|) per pair,
    * corpus-independent). That per-pair product is the one cost knob:
    * summarization pairs are short, but a pathological corpus can
    * carry 10⁵-token rows whose 10¹⁰-cell DP stalls a task —
    * `maxTokens > 0` truncates BOTH sides to their first maxTokens
    * tokens (the standard eval-harness truncation), bounding every
    * pair's work; 0 (default) scores full sequences.
    *
    * @return (idCol, lcs_len, n_hyp, n_ref, prec_ppm, rec_ppm,
    *         rouge_l_ppm) */
  def rougeL(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String, maxTokens: Int = 0): DataFrame = {
    require(maxTokens >= 0, s"maxTokens=$maxTokens must be >= 0")
    requireNoCollision("id", idCol, Seq("lcs_len", "n_hyp", "n_ref",
      "prec_ppm", "rec_ppm", "rouge_l_ppm", "_ht", "_rt"))
    graft.plans.GraftExtensions.register(pairs.sparkSession)
    def toks(c: Column) = {
      val t = filter(split(lower(trim(c)), "\\s+"), x => length(x) > 0)
      if (maxTokens > 0) slice(t, 1, maxTokens) else t
    }
    pairs.select(col(idCol).as(idCol),
        toks(col(hypCol)).as("_ht"), toks(col(refCol)).as("_rt"))
      .select(col(idCol),
        coalesce(graft.plans.ArrayLcsLengthExpression
          .lcsNative(col("_ht"), col("_rt")), lit(0L)).as("lcs_len"),
        coalesce(size(col("_ht")).cast("long"), lit(0L)).as("n_hyp"),
        coalesce(size(col("_rt")).cast("long"), lit(0L)).as("n_ref"))
      .select(col(idCol), col("lcs_len"),
        greatest(col("n_hyp"), lit(0L)).as("n_hyp"),
        greatest(col("n_ref"), lit(0L)).as("n_ref"))
      .withColumn("prec_ppm", when(col("n_hyp") === 0, lit(0L))
        .otherwise(expr("lcs_len * 1000000L div n_hyp")))
      .withColumn("rec_ppm", when(col("n_ref") === 0, lit(0L))
        .otherwise(expr("lcs_len * 1000000L div n_ref")))
      .withColumn("rouge_l_ppm",
        when(expr("prec_ppm + rec_ppm") === 0, lit(0L))
          .otherwise(expr(
            "2L * prec_ppm * rec_ppm div (prec_ppm + rec_ppm)")))
  }

  /** ROUGE-Lsum per (hypothesis, reference) pair (Lin 2004 §3.2, the
    * rouge-score library's newline-split convention): summary-level
    * union-LCS — texts split into sentences on '\n', each
    * reference-sentence position counts once if it participates in an
    * optimal LCS with ANY candidate sentence, and hits are CLIPPED
    * per token against the hypothesis's global token supply
    * (rouge-score's counter-decrement loop in closed form — r15
    * advice; without it, repeated stopwords/entities matching in more
    * reference sentences than the hypothesis holds them inflated the
    * score on ordinary text):
    *
    *   rec_ppm  = hits·10⁶ div Σ|ref sents|;
    *   prec_ppm = hits·10⁶ div Σ|hyp sents|;
    *   rouge_lsum_ppm = F1
    *
    * This is the rougeLsum summarization evals quote next to
    * [[rougeL]] (whole-text LCS ignores sentence structure; Lsum
    * rewards per-sentence coverage). Clipping bounds hits by both
    * sides' token totals, so precision and recall are ≤ 10⁶ ppm,
    * matching rouge-score. Union membership uses the
    * alignment-independent ∃-optimal test rather than rouge-score's
    * implementation-defined backtrack — the residual (clip-bounded)
    * deviation, documented on the kernel
    * ([[graft.plans.SentenceUnionLcsExpression]]); on inputs without
    * repeated cross-sentence tokens the two definitions coincide
    * (Lin's own w1..w5 example scores identically).
    *
    * Plan: zero-shuffle narrow projection (the [[rougeL]] argument) —
    * sentence token arrays built in-row, the union-LCS is the native
    * row-local kernel, O(Σ_i Σ_j m_i·n_j) per pair. `maxTokens > 0`
    * truncates every SENTENCE to its first maxTokens tokens, bounding
    * each sentence pair's DP; 0 (default) scores full sentences.
    * Empty sentences (consecutive newlines) are dropped; a side with
    * zero tokens scores 0 and every input pair emits a row (the
    * [[tokenF1]] convention).
    *
    * @return (idCol, union_hits, n_hyp, n_ref, prec_ppm, rec_ppm,
    *         rouge_lsum_ppm) */
  def rougeLsum(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String, maxTokens: Int = 0): DataFrame = {
    require(maxTokens >= 0, s"maxTokens=$maxTokens must be >= 0")
    requireNoCollision("id", idCol, Seq("union_hits", "n_hyp", "n_ref",
      "prec_ppm", "rec_ppm", "rouge_lsum_ppm", "_hs", "_rs"))
    graft.plans.GraftExtensions.register(pairs.sparkSession)
    def sentToks(c: Column) = {
      val sents = transform(split(c, "\n"), s => {
        val t = filter(split(lower(trim(s)), "\\s+"), x => length(x) > 0)
        if (maxTokens > 0) slice(t, 1, maxTokens) else t
      })
      filter(sents, a => size(a) > 0)
    }
    def tokTotal(c: Column) =
      coalesce(aggregate(c, lit(0L),
        (acc, s) => acc + size(s).cast("long")), lit(0L))
    pairs.select(col(idCol).as(idCol),
        sentToks(col(hypCol)).as("_hs"), sentToks(col(refCol)).as("_rs"))
      .select(col(idCol),
        coalesce(graft.plans.SentenceUnionLcsExpression
          .unionLcsNative(col("_hs"), col("_rs")), lit(0L))
          .as("union_hits"),
        tokTotal(col("_hs")).as("n_hyp"),
        tokTotal(col("_rs")).as("n_ref"))
      .withColumn("prec_ppm", when(col("n_hyp") === 0, lit(0L))
        .otherwise(expr("union_hits * 1000000L div n_hyp")))
      .withColumn("rec_ppm", when(col("n_ref") === 0, lit(0L))
        .otherwise(expr("union_hits * 1000000L div n_ref")))
      .withColumn("rouge_lsum_ppm",
        when(expr("prec_ppm + rec_ppm") === 0, lit(0L))
          .otherwise(expr(
            "2L * prec_ppm * rec_ppm div (prec_ppm + rec_ppm)")))
  }

  /** Column-level LCS length in PREFIX-MAX row form — the
    * bit-identity cross-check for [[rougeL]]'s native kernel (the
    * chrFViaAgg convention) and the SAME recurrence the DuckDB oracle
    * replays as a recursive CTE, so kernel, cross-check, and oracle
    * are three executions of one algorithm:
    *
    *   dp_i[j] = max(dp_{i−1}[j],
    *             max_{j'≤j, y_{j'}=x_i} (dp_{i−1}[j'−1] + 1))
    *
    * (an LCS of X[1..i], Y[1..j] either skips x_i or matches it at
    * some j' ≤ j — the within-row dp_i[j−1] dependency of the classic
    * recurrence eliminated, which is what makes the row step a pure
    * `transform`). O(m·n²) per row — spec/oracle-scale only; the
    * production path is the O(m·n) kernel. */
  private[graft] def lcsLenViaFold(h: Column, r: Column): Column = {
    val fold = element_at(
      aggregate(h,
        transform(sequence(lit(0), size(r)), _ => lit(0L)),
        (dp, x) => concat(array(lit(0L)),
          transform(sequence(lit(1), size(r)), j =>
            greatest(element_at(dp, (j + 1).cast("int")),
              aggregate(sequence(lit(1), j), lit(0L), (m, jp) =>
                greatest(m, when(element_at(r, jp.cast("int")) === x,
                  element_at(dp, jp.cast("int")) + 1)
                  .otherwise(lit(0L)))))))),
      size(r) + 1)
    // the empty-side guard must SHORT-CIRCUIT the fold (CaseWhen
    // evaluates only the matching branch): sequence(1, 0) steps DOWN
    // — the renderConversation lesson
    when(h.isNull || r.isNull, lit(null).cast("long"))
      .when(size(h) === 0 || size(r) === 0, lit(0L))
      .otherwise(fold)
  }

  /** Fréchet distance between two embedding corpora under DIAGONAL
    * covariance (the FID construction — Heusel et al. 2017, "GANs
    * Trained by a Two Time-Scale Update Rule Converge to a Local Nash
    * Equilibrium" — with the per-dimension independence simplification
    * common at corpus scale): the DISTRIBUTION-level generation
    * signal next to the family's pair-level metrics — "has my
    * synthetic corpus drifted from the reference in embedding space"
    * without any pairing at all:
    *
    *   fd = Σ_i (μa_i − μb_i)² + (√var_a_i − √var_b_i)²
    *
    * (per-dim Gaussians; the full-covariance FID needs a matrix
    * square root, which is neither SQL-replayable nor integer-exact —
    * out of the engine-exact budget by design, documented).
    *
    * Engine-exact discipline: vectors quantize to integers FIRST
    * (floor(x·scale) — the KMeans convention), so each side's
    * per-dimension (n, Σq, Σq²) are EXACT integers that commute under
    * any partitioning; μ/var/sqrt then run as ONE fixed double
    * expression tree over those exact inputs (sqrt is correctly
    * rounded — the q_grpo_adv budget), each dimension's two terms
    * floor-quantize to micro units independently (de-quantized by
    * scale², so the result reads in input units²), and the cross-dim
    * totals are integer sums. The SQL oracle replays every step
    * bit-for-bit.
    *
    * Scale shape: one narrow quantize+posexplode per side → per-side
    * two-phase agg onto |dim| keys (map-side combine bounds every
    * task's shuffle output at |dim| rows) → a |dim|-row join → 1-row
    * final agg. State is dimension-bounded, corpus-unbounded-safe.
    * Ragged or mismatched dimensions FAIL the job in-plan (a missing
    * dimension on one side or a per-dim row-count disagreement would
    * silently skew every moment).
    *
    * @return ONE row: (dims, n_a, n_b, mean_term_micro,
    *         var_term_micro, fd_micro) with fd_micro = mean + var
    *         terms (each already floor-quantized per dimension) */
  def embedFrechetDiag(a: DataFrame, b: DataFrame, vecCol: String,
      scale: Int = 1024): DataFrame =
    fdFromMoments(vecMoments(a, vecCol, scale),
      vecMoments(b, vecCol, scale), scale)

  /** The per-dimension EXACT integer moment registers BOTH
    * diagonal-Fréchet execution modes aggregate to: (dim, n, s, ss) —
    * |dim| rows at any corpus size. Narrow quantize + posexplode +
    * ONE keyed agg, so it is stream-legal unchanged
    * ([[graft.streaming.StreamingEmbedDrift]] delegates here — the
    * gramRegisters one-key-function/two-execution-modes discipline),
    * and moment frames from batch shards or stream snapshots merge by
    * re-aggregating sum(n)/sum(s)/sum(ss) (exact integers commute
    * under any partitioning). */
  def vecMoments(df: DataFrame, vecCol: String,
      scale: Int = 1024): DataFrame = {
    require(scale >= 1, s"scale=$scale must be >= 1")
    df.where(col(vecCol).isNotNull)
      .select(posexplode(KMeans.quantize(col(vecCol), scale))
        .as(Seq("dim", "q")))
      // null ELEMENT guard (r14 advice): count(1) counts the exploded
      // row while sum(q)/sum(q·q) would skip a null q, so μ/var would
      // be computed over mismatched n — silently, on both engines.
      // Fail the job instead; the ragged/mismatched guards in
      // [[fdFromMoments]] cannot see this case (the row IS counted on
      // its side).
      .select(col("dim"),
        when(col("q").isNotNull, col("q"))
          .otherwise(raise_error(concat(
            lit("embedFrechetDiag: null element at dimension "),
            col("dim").cast("string"),
            lit(" — a null inside a vector would skew the moments " +
              "(the row counts toward n but not toward the sums)")))
            .cast("long")).as("q"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"), sum("q").as("s"),
        sum(expr("q * q")).as("ss"))
  }

  /** The diagonal-Fréchet distance from ANY two [[vecMoments]] frames
    * — a batch build, a union of shard moments, or a snapshot of the
    * streaming twin's state vs a persisted reference table. `scale`
    * must be the one the moments were built with (it de-quantizes the
    * micro terms); [[graft.streaming.StreamingEmbedDrift]] persists it
    * beside the reference moments and checks. Same output row and
    * guards as [[embedFrechetDiag]]. */
  def fdFromMoments(a: DataFrame, b: DataFrame,
      scale: Int = 1024): DataFrame = {
    require(scale >= 1, s"scale=$scale must be >= 1")
    // re-alias both sides (the approxFromRegisters convention): two
    // frames derived from the SAME named snapshot view carry identical
    // attribute ids, and the join only resolves on fresh ones
    def side(df: DataFrame, suf: String) = df.select(col("dim"),
      col("n").as(s"n_$suf"), col("s").as(s"s_$suf"),
      col("ss").as(s"ss_$suf"))
    val sq = scale.toLong * scale
    def moments(side: String) = {
      val mu = col(s"s_$side").cast("double") /
        col(s"n_$side").cast("double")
      val vr = greatest(
        col(s"ss_$side").cast("double") /
          col(s"n_$side").cast("double") - mu * mu, lit(0.0))
      (mu, vr)
    }
    val joined = side(a, "a").join(side(b, "b"), Seq("dim"),
      "full_outer")
    val (muA, varA) = moments("a")
    val (muB, varB) = moments("b")
    val dMu = muA - muB
    val dSd = sqrt(varA) - sqrt(varB)
    val perDim = joined.select(
      // a dimension present on only one side = mismatched embedding
      // widths — fail loudly, never an intersection-only distance
      when(col("n_a").isNull || col("n_b").isNull,
        raise_error(concat(lit("embedFrechetDiag: dimension "),
          coalesce(col("dim").cast("string"), lit("null")),
          lit(" present on only one side — mismatched embedding " +
            "dims or an empty side")))
          .cast("long")).otherwise(col("n_a")).as("n_a"),
      col("n_b"),
      floor(dMu * dMu * 1000000.0 / sq.toDouble).cast("long")
        .as("mean_q"),
      floor(dSd * dSd * 1000000.0 / sq.toDouble).cast("long")
        .as("var_q"))
    perDim.agg(
        count(lit(1)).as("dims"),
        // ragged-corpus guard: every dimension must have seen every
        // row of its side. The empty-input branch comes FIRST: with
        // zero perDim rows min/max are NULL, the ragged condition is
        // NULL, and CaseWhen would fall through to the ragged raise —
        // a misleading diagnosis for "both corpora empty"
        when(count(lit(1)) === 0, raise_error(
            lit("embedFrechetDiag: no vector rows on either side — " +
              "both corpora empty after the null filter"))
            .cast("long"))
          .when(min("n_a") === max("n_a"), min("n_a"))
          .otherwise(raise_error(
            lit("embedFrechetDiag: ragged vectors on side A — " +
              "per-dimension row counts disagree")).cast("long"))
          .as("n_a"),
        when(count(lit(1)) === 0, lit(null).cast("long"))
          .when(min("n_b") === max("n_b"), min("n_b"))
          .otherwise(raise_error(
            lit("embedFrechetDiag: ragged vectors on side B — " +
              "per-dimension row counts disagree")).cast("long"))
          .as("n_b"),
        sum("mean_q").as("mean_term_micro"),
        sum("var_q").as("var_term_micro"))
      .withColumn("fd_micro",
        expr("mean_term_micro + var_term_micro"))
      .select("dims", "n_a", "n_b", "mean_term_micro",
        "var_term_micro", "fd_micro")
  }

  /** Character error rate per pair: native `levenshtein` (identical
    * unit-cost edit distance in Spark and DuckDB — no UDF, no
    * quantization question) over whitespace-NORMALIZED strings (runs
    * collapsed to one space, ends trimmed: raw formatting differences
    * are not transcription errors), against the reference length:
    *
    *   cer_ppm = lev(h, r)·10⁶ div len(r)
    *
    * Pairs with an empty/null normalized reference are NOT emitted —
    * no denominator exists for them (the rankingMetrics n_rel
    * convention). CER can exceed 10⁶ when the hypothesis is much
    * longer than the reference; that is the metric's real behavior,
    * not an error.
    *
    * @return (idCol, edit_dist, ref_chars, cer_ppm) */
  def cer(pairs: DataFrame, idCol: String, hypCol: String,
      refCol: String): DataFrame = {
    requireNoCollision("id", idCol,
      Seq("edit_dist", "ref_chars", "cer_ppm", "_h", "_r"))
    def norm(c: Column) = regexp_replace(trim(c), "\\s+", " ")
    pairs.select(col(idCol).as(idCol),
        norm(col(hypCol)).as("_h"), norm(col(refCol)).as("_r"))
      .where(col("_r").isNotNull && length(col("_r")) > 0 &&
        col("_h").isNotNull)
      .select(col(idCol),
        levenshtein(col("_h"), col("_r")).cast("long").as("edit_dist"),
        length(col("_r")).cast("long").as("ref_chars"))
      .withColumn("cer_ppm", expr("edit_dist * 1000000L div ref_chars"))
  }

  /** Distinct-n diversity per group: distinct word n-grams over total
    * word n-grams for each order — the mode-collapse detector for
    * generated corpora (distinct-1/2 near 0 = the generator loops).
    * Exact distinct via two-phase aggregation (the corpus-bounded agg
    * a diversity audit needs to be exact at; HLL sketches live in
    * [[Hll]] for the approximate path).
    *
    * @return (groupCol, n, total_ngrams, distinct_ngrams,
    *         distinct_ppm) — one row per (group, order), groups with
    *         zero n-grams of an order omitted (no denominator) */
  def distinctN(docs: DataFrame, groupCol: String, textCol: String,
      orders: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(orders.nonEmpty && orders.forall(n => n >= 1 && n <= 8),
      s"orders $orders outside [1, 8]")
    requireNoCollision("group", groupCol, Seq("n", "total_ngrams",
      "distinct_ngrams", "distinct_ppm", "s"))
    explodedGrams(docs, groupCol, textCol, orders)
      .groupBy(col(groupCol), col("s.n").as("n"))
      .agg(count(lit(1)).as("total_ngrams"),
        countDistinct(col("s.g")).as("distinct_ngrams"))
      .withColumn("distinct_ppm",
        expr("distinct_ngrams * 1000000L div total_ngrams"))
  }

  /** The per-(group, order) word-n-gram stream both distinct-n forms
    * aggregate — one Generate, (groupCol, s.n, s.g) rows. */
  private def explodedGrams(docs: DataFrame, groupCol: String,
      textCol: String, orders: Seq[Int]): DataFrame = {
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
      t => length(t) > 0)
    val grams = flatten(transform(
      typedLit(orders.distinct.sorted), n =>
        transform(
          sequence(lit(1), greatest(size(toks) - n + 1, lit(1))),
          i => struct(n.as("n"),
            when(size(toks) - n + 1 >= i,
              concat_ws(" ", slice(toks, i, n))).as("g")))))
    docs.where(col(textCol).isNotNull)
      .select(col(groupCol), explode(grams).as("s"))
      .where(col("s.g").isNotNull)
  }

  /** [[distinctN]]'s 100 TB twin: the SAME diversity report with the
    * exact per-(group, order) `count(DISTINCT gram)` — the family's
    * one UNBOUNDED state, since the aggregation's shuffle carries
    * every distinct n-gram of a vocabulary that grows supra-linearly
    * with the corpus (SCALING.md measured 5.2× work at 10× on a
    * vocab-growth fixture) — replaced by the engine's [[Hll]] sketch
    * (the q_hll_distinct oracle convention): state collapses to
    * ≤ |groups|·|orders|·4096 register rows regardless of vocabulary,
    * map-side combine bounds every task's shuffle output the same
    * way, and the estimate is σ ≈ 1.6% — diversity ratios are a
    * mode-collapse ALARM, where 2% noise changes no decision; the
    * exact form stays the default for audit-grade reports.
    *
    * One pass over the gram stream: registers carry their bucket
    * counts, so total_ngrams = Σ bucket counts and no second corpus
    * aggregation exists; the register frame (bounded) is
    * persistTracked for its two readers.
    *
    * Engine-exact discipline: the sketch replays bit-for-bit in SQL —
    * md5-derived 56-bit hash, exact-integer 2⁴⁵-scaled registers, the
    * shared α·m²·2⁴⁵ double literal — so even the APPROXIMATE path is
    * oracle-checked exactly.
    *
    * @return (groupCol, n, total_ngrams, n_present, s_scaled,
    *         est_raw_q, est_q, distinct_ppm_est) — est_q is the HLL
    *         estimate of distinct_ngrams; distinct_ppm_est =
    *         est_q·10⁶ div total (may exceed 10⁶ on small groups —
    *         HLL can overestimate; the exact twin cannot) */
  def distinctNApprox(docs: DataFrame, groupCol: String,
      textCol: String, orders: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    import Caches.Persisted
    val regs = gramRegisters(docs, groupCol, textCol, orders)
      .persistTracked
    approxFromRegisters(regs, groupCol)
  }

  /** The bounded register frame BOTH distinct-n-approx execution
    * modes aggregate to: (groupCol, n, bucket, bucket_count, min_len)
    * — ≤ |groups|·|orders|·4096 rows. Narrow projections + ONE keyed
    * agg, so it is stream-legal unchanged
    * ([[graft.streaming.StreamingDistinctN]] delegates here — the
    * StreamingHll one-key-function/two-execution-modes discipline),
    * and register frames from batch shards and stream snapshots merge
    * by re-aggregating sum(bucket_count)/min(min_len). */
  private[graft] def gramRegisters(docs: DataFrame, groupCol: String,
      textCol: String, orders: Seq[Int]): DataFrame = {
    require(orders.nonEmpty && orders.forall(n => n >= 1 && n <= 8),
      s"orders $orders outside [1, 8]")
    requireNoCollision("group", groupCol, Seq("n", "total_ngrams",
      "n_present", "s_scaled", "est_raw_q", "est_q",
      "distinct_ppm_est", "s", "bucket", "bucket_count", "min_len"))
    // ONE shared hash→bucket→rank projection (Hll.bucketLens) — the
    // sketch layout constants live in Hll only, so a P/RemMod change
    // there cannot silently desynchronize these registers from the
    // estimator they feed
    Hll.bucketLens(
        explodedGrams(docs, groupCol, textCol, orders)
          .select(col(groupCol), col("s.n").as("n"),
            col("s.g").as("_g")),
        Seq(groupCol, "n"), col("_g"))
      .groupBy(col(groupCol), col("n"), col("bucket"))
      .agg(count(lit(1)).as("bucket_count"), min("_len").as("min_len"))
  }

  /** Totals + HLL estimate from ANY [[gramRegisters]] frame — a batch
    * build, a union of shard sketches, or a snapshot of the streaming
    * twin's state. */
  def approxFromRegisters(regs: DataFrame,
      groupCol: String): DataFrame = {
    val tot = regs.groupBy(col(groupCol), col("n"))
      .agg(sum("bucket_count").cast("long").as("total_ngrams"))
    // re-alias the estimator side: both join inputs derive from the
    // SAME frame, and when that frame is a named view (a streaming
    // memory-sink snapshot) the two branches carry identical attribute
    // ids — the aliases mint fresh ones, which is what lets the join
    // resolve (batch parquet lineage happened to dodge this)
    val estSide = regs.select(
      regs.columns.map(c => col(c).as(c)): _*)
    val est = Hll.estimateFromRegistersBy(estSide, Seq(groupCol, "n"))
    tot.join(est, Seq(groupCol, "n"))
      .select(col(groupCol), col("n"), col("total_ngrams"),
        col("n_present"), col("s_scaled"), col("est_raw_q"),
        col("est_q"))
      .withColumn("distinct_ppm_est",
        expr("est_q * 1000000L div total_ngrams"))
  }
}
