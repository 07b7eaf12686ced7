package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted

/** Corpus relevance scoring for training-data curation: TF-IDF term
  * statistics and Okapi BM25 ranking (Robertson & Walker 1994; the scoring
  * function behind Lucene/Elasticsearch defaults). In an LLM data pipeline
  * this is the "find documents about X" primitive — benchmark-leak triage,
  * topical subset extraction, quality-by-query curation.
  *
  * Scale design: one keyed shuffle builds per-(doc, term) frequencies; the
  * per-term document-frequency/IDF table is tiny (≤ vocabulary of the
  * query) and broadcasts back; the corpus scalars (N, avg doc length) stay
  * in-plan as a broadcast cross join — never a driver collect. The final
  * per-doc sum is the only other shuffle. Top-k goes through
  * `orderBy(...).limit(k)` = TakeOrderedAndProject, a distributed
  * partial top-k with no single-partition window over the corpus.
  */
object Relevance {

  /** Whitespace tokens of the normalized text (trim → lower → collapse
    * whitespace) — the same normalization contract as the dedup shingles
    * and the DuckDB oracles. */
  def tokens(textCol: Column): Column =
    split(regexp_replace(lower(trim(textCol)), "\\s+", " "), " ")

  /** Per-(doc, term) TF joined with per-term DF, restricted to `terms`
    * (Nil = full vocabulary — then the DF table may be large and the
    * broadcast hint should be dropped by the caller via re-join). */
  def termStats(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String] = Nil): DataFrame = {
    val t = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val filtered = if (terms.isEmpty) t else t.where(col("term").isin(terms: _*))
    val tf = filtered.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("term"))
  }

  /** Inverted-index build — the IR primitive under [[bm25]]: per term,
    * document frequency, total term frequency, and the first `k` posting
    * doc ids (sorted) as a bounded preview column.
    *
    * Scale shape: explode → (term, doc) two-phase agg → per-term stats
    * agg, all keyed shuffles. The preview postings go through a
    * `row_number ≤ k` window that Spark rewrites to WindowGroupLimit
    * (per-task top-k state, the q_stratified_sample mechanism) — NOT a
    * collect-everything-then-slice, so per-term state is k rows even for
    * stopword-grade terms. Materializing FULL posting lists is a sink
    * concern (the output there is corpus-sized by definition); this
    * operator returns the index STATS plus the bounded heads that
    * queries and oracles can compare exactly. */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("tf_total"))
    val heads = tf
      .withColumn("_rk", row_number().over(
        Window.partitionBy("term").orderBy("doc_id")))
      .where(col("_rk") <= k)
      .groupBy("term")
      .agg(array_join(sort_array(collect_list("doc_id")), ",")
        .as("postings_head"))
    stats.join(heads, Seq("term"))
  }

  /** Okapi BM25 scores of `queryTerms` against every document: returns
    * (doc_id, n_terms_hit, score) for documents matching ≥ 1 term.
    *
    * `quantize = Some(s)`: each per-term contribution is floored to 1/s
    * and the per-doc score summed in exact integers — the engine-
    * deterministic mode (float sums are order-dependent; integer sums are
    * not), used by the oracle-compared driver query. None = raw IEEE
    * doubles for production ranking.
    *
    * Caching contract: the compact tokenized base (doc length +
    * query-term occurrences) is session-cached for the duration of the
    * returned plan — three consumers (tf, df, corpus scalars) would
    * otherwise re-scan the corpus. Long-lived sessions issuing many
    * bm25 calls should `spark.catalog.clearCache()` between them (the
    * bench does), or unpersist via the catalog.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      quantize: Option[Long] = None): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    // tokenize ONCE: tf, df, and the corpus scalars all consume this
    // frame, and Spark re-executes shared lineage per consumer — without
    // the persist the corpus would be scanned and tokenized three times.
    // The persisted shape is compact on purpose: doc length + only the
    // query-term occurrences (duplicates kept — tf needs counts), never
    // the full token array.
    val base = docs.select(col(idCol).as("doc_id"),
        tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("dl"),
        filter(col("toks"), t => t.isInCollection(queryTerms)).as("qtoks"))
      .persistTracked
    val tf = base.select(col("doc_id"), col("dl"),
        explode(col("qtoks")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus scalars in-plan: 1-row aggregate broadcast-cross-joined
    val corpus = base.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_dl"))
    val idf = df.crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
    val scored = tf.join(broadcast(idf), Seq("term"))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs"))
      .withColumn("contrib",
        col("idf") * (col("tf") * (k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1.0) - b +
            lit(b) * col("dl") / col("avgdl"))))
    quantize match {
      case Some(s) =>
        scored
          .withColumn("cq", floor(col("contrib") * s).cast("long"))
          .groupBy("doc_id")
          .agg((sum("cq").cast("double") / s).as("score"),
            count(lit(1)).as("n_terms_hit"))
      case None =>
        scored.groupBy("doc_id")
          .agg(sum("contrib").as("score"), count(lit(1)).as("n_terms_hit"))
    }
  }

  /** Positional phrase search: documents containing the exact
    * consecutive token sequence `phrase`, with occurrence counts —
    * the positional-index query the [[invertedIndex]] stats summarize
    * (Lucene PhraseQuery semantics at slop 0). Overlapping occurrences
    * each count: "a b a b a" contains "a b a" twice.
    *
    * Plan shape: the token explode is filtered to the phrase's terms
    * BEFORE any shuffle — for a k-word phrase only matching positions
    * (a vanishing fraction of a 100 TB corpus; Catalyst pushes the isin
    * into the generate) reach the doc-keyed agg. Per doc, term i's
    * positions collect SHIFTED by −i, so phrase starts are the k-way
    * `array_intersect` of the per-term arrays — per-doc state is
    * bounded by phrase-term occurrences, and no window or self-join
    * ever forms. */
  def phraseOccurrences(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val tok = docs.select(col(idCol).as("doc_id"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
      .where(col("term").isin(phrase.distinct: _*))
    val shifted = phrase.zipWithIndex.map { case (w, i) =>
      // when() without otherwise yields null; collect_list drops nulls
      sort_array(collect_list(when(col("term") === w, col("pos") - i)))
        .as(s"_p$i")
    }
    val starts = phrase.indices.tail
      .foldLeft[Column](col("_p0"))((acc, i) =>
        array_intersect(acc, col(s"_p$i")))
    tok.groupBy("doc_id")
      .agg(shifted.head, shifted.tail: _*)
      .select(col("doc_id"),
        size(starts).cast("long").as("n_occurrences"))
      .where(col("n_occurrences") > 0)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) — the
    * standard way a hybrid retrieval stack combines a lexical ranking
    * with a semantic (ANN) one without score calibration:
    * fused(q, d) = Σ_lists 1/(k + rank_list(q, d)), k = 60 in the paper.
    * Contributions are carried as exact integers
    * (`10⁹ div (k + rank)` — ranks are small, so the quantization is
    * ~1 ppb and, being deterministic, replays bit-for-bit in SQL),
    * which makes the fused ordering engine-exact — the q_bm25 quantized
    * discipline applied to rank fusion.
    *
    * Inputs: each ranking is (queryCol, idCol, rankCol) rows — top-k
    * lists from [[bm25]], `SimilaritySearch.bruteForceTopK`, an
    * LSH/IVF/PQ ranking, or any other retriever. Output: per query the
    * `topK` fused candidates with (rrf_score_ppb, n_lists, fused_rank);
    * ties break on ascending id (total order, engine-portable).
    *
    * Scale shape: a union of k-bounded rank lists (each query
    * contributes ≤ Σ list-k rows — candidate-sized, never corpus-
    * sized), one keyed agg, and a per-query top-k whose rank-1..topK
    * filter Spark recognizes as WindowGroupLimit — bounded window
    * state, no global sort. */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, idCol: String,
      rankCol: String, k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(k >= 1 && topK >= 1, s"k/topK must be positive: $k/$topK")
    import org.apache.spark.sql.expressions.Window
    val unioned = rankings
      .map(_.select(col(queryCol), col(idCol), col(rankCol)))
      .reduce(_ unionByName _)
    unioned
      .select(col(queryCol), col(idCol),
        expr(s"CAST(1000000000 DIV ($k + $rankCol) AS BIGINT)").as("_c"))
      .groupBy(col(queryCol), col(idCol))
      .agg(sum("_c").as("rrf_score_ppb"),
        count(lit(1)).as("n_lists"))
      .withColumn("fused_rank", row_number().over(
        Window.partitionBy(queryCol)
          .orderBy(col("rrf_score_ppb").desc, col(idCol))))
      .where(col("fused_rank") <= topK)
  }

  /** Quantized per-rank DCG discount table: floor(10⁶ / log2(r+1)) for
    * r = 1..k, computed ONCE driver-side and embedded LITERALLY in
    * both engines — Spark's log2 is ln(x)/ln(2) while DuckDB's is the
    * C log2(), which can differ in the last ulp, so neither engine's
    * log runs at execution time (the langStopwords generated-oracle
    * convention: one Scala computation feeds both sides). */
  def dcgDiscounts(k: Int): Seq[Long] = {
    require(k >= 1 && k <= 10000, s"k=$k outside [1, 10000]")
    (1 to k).map(r =>
      math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0))).toLong)
  }

  /** Ideal-DCG prefix sums of [[dcgDiscounts]]: entry m = the DCG of a
    * perfect ranking with m relevant docs in the top m. */
  def dcgIdealPrefix(k: Int): Seq[Long] =
    dcgDiscounts(k).scanLeft(0L)(_ + _).tail

  /** IR ranking metrics — recall@k, MRR@k, nDCG@k, precision@k, MAP@k
    * per query over a ranked result list vs a binary relevance truth
    * table: the evaluation leg of the retrieval family (anything
    * emitting (query, id, rank) — [[bm25]], brute-force/LSH/IVF/PQ
    * rankings, [[rrfFuse]] output).
    *
    * Engine-exact: per-rank discounts come from the literal
    * [[dcgDiscounts]] table (quantized BEFORE summation, so summation
    * order cannot matter), IDCG from the literal [[dcgIdealPrefix]]
    * at min(n_rel, k), and the final ratios are ppm integer divisions:
    * recall_ppm = hits·10⁶ div n_rel; mrr_ppm = 10⁶ div first-hit
    * rank (0 when the top-k misses everything); ndcg_ppm = dcg_q·10⁶
    * div idcg_q — exactly 10⁶ for a perfect ranking by construction;
    * precision_ppm = hits·10⁶ div k; map_ppm = average precision at k
    * with each per-hit precision quantized BEFORE the mean —
    * (Σ_hits cum_hits·10⁶ div rank) div min(n_rel, k), where cum_hits
    * numbers the query's hits in (rank, id) order — so the sum is
    * order-independent integer arithmetic and a perfect ranking scores
    * exactly 10⁶ when n_rel ≤ k.
    *
    * Ranks outside [1, k] are rejected in-plan (raise_error): a
    * rank ≤ 0 would silently index the discount table from the END
    * (element_at's negative-index semantics) and drive mrr_ppm
    * negative — garbage metrics, no error (r12 advice). Over-k ranks
    * are simply outside the @k window and are filtered, not errors.
    *
    * Scale shape: results are k-bounded per query (candidate-sized);
    * one keyed join against the truth table + one window and two keyed
    * aggs over the hits — no corpus-sized stage. Queries with no
    * relevant truth rows are not emitted (no denominator exists).
    *
    * @return (query_id, n_rel, n_hits, recall_ppm, mrr_ppm, ndcg_ppm,
    *         precision_ppm, map_ppm) */
  def rankingMetrics(results: DataFrame, truth: DataFrame,
      queryCol: String, idCol: String, rankCol: String,
      k: Int): DataFrame =
    // the single-cutoff form IS the multi-cutoff pass at one k
    // (RelevanceSpec pins the slice equality) — one copy of the
    // guard/dedup/window/ppm arithmetic to maintain, not two
    rankingMetricsAt(results, truth, queryCol, idCol, rankCol,
      Seq(k)).drop("k")

  /** [[rankingMetrics]] at SEVERAL cutoffs in one pass — the @1/@5/@10
    * table every retrieval eval reports, without re-joining the truth
    * per cutoff: ONE truth join and ONE hit-ordinal window at max(ks),
    * then each hit fans out to the cutoffs it sits inside (explode of
    * a literal array — candidate-sized × |ks|) and the same per-query
    * aggregation groups by (query, k). The hit ordinal needs computing
    * only once because a hit's cumulative position among hits with
    * rank ≤ k is independent of k (every predecessor has a smaller
    * rank, hence also ≤ k).
    *
    * Per-(query, k) rows replay in SQL as the single-k oracle cross-
    * joined with the cutoff list. Same rank∈[1, max k] in-plan guard
    * and ppm discipline as the single-cutoff form.
    *
    * @return (query_id, k, n_rel, n_hits, recall_ppm, mrr_ppm,
    *         ndcg_ppm, precision_ppm, map_ppm) — one row per
    *         (relevant-truth query) × cutoff */
  def rankingMetricsAt(results: DataFrame, truth: DataFrame,
      queryCol: String, idCol: String, rankCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"cutoffs $ks must be non-empty, all >= 1")
    require(ks.distinct.size == ks.size, s"duplicate cutoffs in $ks")
    import org.apache.spark.sql.expressions.Window
    val maxK = ks.max
    val discounts = typedLit(dcgDiscounts(maxK))
    val idealPrefix = typedLit(dcgIdealPrefix(maxK))
    val kList = typedLit(ks.sorted)
    val r = results.select(col(queryCol).as("query_id"),
      col(idCol).as("id"),
      when(col(rankCol) >= 1, col(rankCol).cast("int"))
        .otherwise(raise_error(concat(
          lit("rankingMetricsAt: rank must be >= 1, got "),
          // coalesce: a NULL rank would null the whole concat and the
          // job would die with an opaque raise_error(null) instead of
          // the contract message (r13 advice)
          coalesce(col(rankCol).cast("string"), lit("null"))))
          .cast("int")).as("rank"))
      .where(col("rank") <= maxK)
      .groupBy("query_id", "id").agg(min("rank").as("rank"))
    val t = truth.select(col(queryCol).as("query_id"),
      col(idCol).as("id")).dropDuplicates("query_id", "id")
    val nRel = t.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
      .select(col("query_id"), col("n_rel"),
        explode(kList).as("k"))
    val hitW = Window.partitionBy("query_id").orderBy("rank", "id")
    val perQK = r.join(t, Seq("query_id", "id"))
      .withColumn("_cum", row_number().over(hitW).cast("long"))
      .select(col("query_id"), col("rank"), col("_cum"),
        explode(kList).as("k"))
      .where(col("rank") <= col("k"))
      .groupBy("query_id", "k")
      .agg(count(lit(1)).as("n_hits"),
        min("rank").as("_first"),
        sum(element_at(discounts, col("rank"))).as("_dcg"),
        sum(expr("_cum * 1000000L div rank")).as("_ap_num"))
    nRel.join(perQK, Seq("query_id", "k"), "left")
      .select(col("query_id"), col("k"), col("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(expr("1000000L div _first"), lit(0L)).as("mrr_ppm"),
        coalesce(col("_dcg"), lit(0L)).as("_dcg"),
        coalesce(col("_ap_num"), lit(0L)).as("_ap_num"),
        element_at(idealPrefix,
          least(col("n_rel"), col("k").cast("long")).cast("int"))
          .as("_idcg"))
      .withColumn("recall_ppm", expr("n_hits * 1000000L div n_rel"))
      .withColumn("ndcg_ppm", expr("_dcg * 1000000L div _idcg"))
      .withColumn("precision_ppm", expr("n_hits * 1000000L div k"))
      .withColumn("map_ppm",
        expr("_ap_num div least(n_rel, CAST(k AS BIGINT))"))
      .select("query_id", "k", "n_rel", "n_hits", "recall_ppm",
        "mrr_ppm", "ndcg_ppm", "precision_ppm", "map_ppm")
  }
}
