package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted
import graft.functions.TextFunctions

/** Training-data preparation operators (beyond-parity LLM-pipeline set):
  * shard packing by token budget, deterministic content-hash splits, and
  * benchmark decontamination. Each is a declarative single-plan operator —
  * window running sums, hash prefixes, and keyed joins — so Catalyst keeps
  * the usual scale properties (partial aggregation, broadcast of the small
  * side, no driver loops).
  */
object DataPrep {

  /** Pack documents into shards by cumulative token budget, sequentially
    * within each `partCol` group (the "fill shards in corpus order"
    * pattern): shard_id = floor(exclusive-prefix-sum(tokens) / budget).
    * A document that straddles a boundary belongs to the shard its first
    * token falls in. One shuffle on `partCol`; the running sum is exact
    * integer arithmetic.
    *
    * At 100 TB the per-group sequential constraint is the point: packing
    * is only order-dependent WITHIN a shard group (source, dump, epoch),
    * and groups pack in parallel. */
  def shardByTokenBudget(docs: DataFrame, idCol: String, partCol: String,
      tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("tokens", tokensCol)
      .withColumn("_cum", sum("tokens").over(w))
      .withColumn("shard_id",
        floor((col("_cum") - col("tokens")) / lit(budget.toDouble)))
      .drop("_cum")
  }

  /** Deterministic train/val/test split on a content-derived sha256
    * prefix: stable across engines, machines, and runs; no RNG state to
    * ship. `bounds` are 2-hex-digit upper bounds per named split, checked
    * in order (e.g. ("train", "cc"), ("val", "e6") → train ≈ 80%,
    * val ≈ 10%, remainder = last split). Lexicographic compare of the
    * lowercase hex prefix is engine-portable (q_hash_id pins sha256
    * parity with the oracle). */
  def hashSplit(df: DataFrame, idCol: String,
      bounds: Seq[(String, String)], rest: String,
      salt: String = "split|"): DataFrame = {
    val h = substring(
      sha2(concat(lit(salt), col(idCol).cast("string")), 256), 1, 2)
    val split = bounds.foldRight(lit(rest)) { case ((name, bound), acc) =>
      when(h < bound, name).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word n-grams with any benchmark document.
    * The benchmark gram set is tiny → broadcast; the corpus side explodes
    * its grams once and joins on the gram key (never doc × doc).
    * Returns (idCol, n_overlap) for flagged documents. */
  def contaminationFlags(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      minOverlap: Long = 2): DataFrame = {
    val corpusGrams = corpus.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
    val benchGrams = benchmark
      .select(explode(TextFunctions.wordShingles(col(textCol), n))
        .as("gram"))
      .distinct()
    corpusGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(countDistinct(col("gram")).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram profile is. Features
    * are word unigrams + adjacent bigrams hashed into `buckets` buckets;
    * the target and raw corpora each fit an add-one-smoothed bucket
    * distribution, and a document's log importance weight is the sum
    * over its feature OCCURRENCES of ln p_target(bucket) − ln
    * p_raw(bucket). Select by top weight or threshold downstream
    * (weighted Gumbel sampling in the paper; the weight is the
    * engine-checked part).
    *
    * Scale shape: TWO corpus-sized gram aggs (map-side combine) reduce
    * both corpora to bucket tables of at most `buckets` rows; the
    * log-ratio table is bucket-sized BY CONSTRUCTION → broadcast; the
    * raw corpus then pays one narrow explode + broadcast join + per-doc
    * agg. Nothing after the aggs is corpus-sized.
    *
    * Determinism: the per-bucket log-ratio is floor-quantized to 1e-6
    * ONCE (ln of exact-integer quotients — identical IEEE bits in any
    * engine), so per-doc sums are integer sums and commute (the
    * unigramLogProb discipline). `portable = true` swaps xxhash64 for
    * the DuckDB-replayable md5Long56 bucket hash (the q_winnow pattern).
    *
    * Returns (idCol, n_feats, weight_q6, avg_logratio). */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096,
      portable: Boolean = false): DataFrame = {
    def bucketOf(gram: Column): Column =
      pmod(if (portable) graft.functions.Hashing.md5Long56(gram)
           else xxhash64(gram), lit(buckets.toLong))
    def featBuckets(df: DataFrame, extra: Column*): DataFrame = {
      val toks = filter(split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)
      // guard the bigram branch: sequence(1, 0) would run DESCENDING and
      // element_at(tk, 0) errors under ANSI — single-token docs emit
      // their unigram only
      val bigrams = when(size(col("tk")) >= 2,
        transform(sequence(lit(1), size(col("tk")) - 1),
          i => concat_ws(" ", element_at(col("tk"), i),
            element_at(col("tk"), i + 1))))
        .otherwise(array().cast("array<string>"))
      df.select(extra :+ toks.as("tk"): _*)
        .select(extra :+ explode(concat(col("tk"), bigrams)).as("gram"): _*)
        .select(extra :+ bucketOf(col("gram")).as("bucket"): _*)
    }
    // bucket tables: <= `buckets` rows each — persist (they feed their
    // own total AND the ratio join; bucket-sized, the vocab convention)
    val t = featBuckets(target).groupBy("bucket")
      .agg(count(lit(1)).as("tc")).persistTracked
    val r = featBuckets(raw, col(idCol)).drop(idCol).groupBy("bucket")
      .agg(count(lit(1)).as("rc")).persistTracked
    val tTot = t.agg(sum("tc").as("_tt"))
    val rTot = r.agg(sum("rc").as("_rt"))
    val b = lit(buckets.toDouble)
    val ratio = r.join(t, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        floor((log((coalesce(col("tc"), lit(0L)).cast("double") + 1.0) /
            (col("_tt").cast("double") + b)) -
          log((col("rc").cast("double") + 1.0) /
            (col("_rt").cast("double") + b)))
          * 1000000).cast("long").as("lr_q6"))
    featBuckets(raw, col(idCol))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum("lr_q6").as("weight_q6"))
      .withColumn("avg_logratio",
        col("weight_q6").cast("double") / (col("n_feats") * 1000000))
  }

  /** Assemble the packed training sequences: after [[shardByTokenBudget]]
    * assigns shard ids, concatenate each shard's documents in id order
    * with `sep` — the final byte-level artifact a tokenize-and-pack
    * pipeline ships. One additional keyed shuffle on (partCol, shard_id);
    * the in-shard sort is bounded by the token budget, not the corpus.
    * Returns (partCol, shard_id, n_docs, total_tokens, packed). */
  def packSequences(docs: DataFrame, idCol: String, partCol: String,
      tokensCol: Column, budget: Long,
      sep: String = "\n<|doc|>\n"): DataFrame = {
    val sharded = shardByTokenBudget(docs, idCol, partCol, tokensCol, budget)
    sharded
      .groupBy(col(partCol), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("tokens").as("total_tokens"),
        concat_ws(sep,
          transform(
            array_sort(collect_list(struct(col(idCol), col("text")))),
            x => x.getField("text"))).as("packed"))
  }

  /** Token-budget-capped priority sampling — the "fill a 10 B-token
    * budget from the pool" curation terminal: per `groupCol`, keep the
    * highest-priority documents (priority = content-stable salted md5
    * draw, the [[stratifiedSample]] uniform) until the INCLUSIVE running
    * token sum reaches `budgetTokens`; a document that would straddle
    * the boundary is dropped (its first excluded token is over budget).
    * Unlike [[stratifiedSample]]'s doc-count cap this caps what training
    * actually spends — tokens — so long docs consume proportionally
    * more budget. Same id → same draw on any engine/partitioning, so
    * refills are incremental and the oracle replays the exact cut.
    *
    * Plan/scale shape: one Exchange(group) + sort for the running-sum
    * window (the [[shardByTokenBudget]] discipline — sequential only
    * within a group, groups fill in parallel); exact integer cumsum.
    *
    * Returns (idCol, groupCol, n_tokens, cum_tokens) for the kept docs.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, groupCol: String,
      tokens: Column, budgetTokens: Long,
      salt: String = "tb|"): DataFrame = {
    import graft.functions.Hashing
    require(budgetTokens >= 0, s"budgetTokens must be >= 0: $budgetTokens")
    val draw = Hashing.md5Long56(
      concat(lit(salt), col(idCol).cast("string")))
    val w = Window.partitionBy(groupCol).orderBy(draw, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), col(groupCol), tokens.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= budgetTokens)
  }

  /** Packing-efficiency profile per group for a context length `ctxLen`
    * — the budget-sizing companion of [[graft.operators.CorpusStats
    * .tokenHistogram]]: how many examples (and how much padding) the
    * group costs under (a) pad-to-context (one doc per example, padded;
    * long docs split first) vs (b) cross-boundary packing
    * ([[trainExamples]] semantics). All-integer arithmetic —
    * `padded_examples` = Σ ceil(n_i/L), `packed_examples` = ceil(Σn_i/L)
    * — so the oracle replays exactly; the efficiency ratios are single
    * divisions of exact integers (identical IEEE cross-engine).
    *
    * One narrow token-count pass → two-phase agg on group keys; nothing
    * after the agg is corpus-sized. Docs with zero tokens are excluded
    * (they cost no example either way). */
  def packEfficiency(docs: DataFrame, groupCol: String, tokens: Column,
      ctxLen: Long): DataFrame = {
    require(ctxLen > 0, s"ctxLen must be positive: $ctxLen")
    val l = lit(ctxLen)
    // `div` (integer division), never float `/` + floor: the quotient
    // stays exact at any Long magnitude and replays identically in the
    // oracle's `//` (the q_epoch_plan DIV discipline)
    docs.select(col(groupCol), tokens.cast("long").as("_n"))
      .where(col("_n") > 0)
      .groupBy(groupCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum("_n").as("total_tokens"),
        sum(expr(s"(_n + ${ctxLen - 1}) div $ctxLen"))
          .as("padded_examples"))
      .withColumn("packed_examples",
        expr(s"(total_tokens + ${ctxLen - 1}) div $ctxLen"))
      .withColumn("pad_waste_tokens",
        col("padded_examples") * l - col("total_tokens"))
      .withColumn("padded_efficiency",
        col("total_tokens").cast("double") / (col("padded_examples") * l))
      .withColumn("packed_efficiency",
        col("total_tokens").cast("double") / (col("packed_examples") * l))
  }

  /** Contiguous global sequence ids 0..n-1 in `orderCol` order — the
    * sample-index assignment a training run needs, done the way that
    * scales: range-repartition + partition-local sort, then RDD
    * zipWithIndex (per-partition counts in one pass, offsets broadcast,
    * ids stamped in a second). The naive `row_number() OVER (ORDER BY …)`
    * is a single-partition window — one task holding the whole corpus —
    * which is exactly what this operator exists to avoid; the RDD hop is
    * the documented per-partition-imperative exception, and the result
    * is equal to the SQL row_number contract (the oracle proves it). */
  def contiguousIds(df: DataFrame, orderCol: String,
      idName: String = "seq_id"): DataFrame =
    contiguousIdsBy(df, Seq(col(orderCol)), idName)

  /** Multi-key / descending-order variant (e.g. a frequency ranking
    * `Seq(col("n").desc, col("subword"))` — [[graft.operators.Tokenizer
    * .encode]]'s vocab-id assignment). `startAt` shifts the first id
    * (1 for row_number parity). */
  def contiguousIdsBy(df: DataFrame, order: Seq[Column], idName: String,
      startAt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.LongType
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(idName, LongType, nullable = false)
    val withIds = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + startAt)) }
    spark.createDataFrame(withIds, schema)
  }

  /** Deterministic global training-data shuffle: every row gets a
    * contiguous shuffle position by ranking on a salted content-stable
    * hash draw (md5(seed ∥ id), ties to id) — same seed → same
    * permutation on every run, engine, and partitioning, so epoch
    * ordering is reproducible and the oracle replays the draw exactly.
    * Scale shape is [[contiguousIdsBy]]'s: range-repartition on the draw
    * + zipWithIndex — never a one-task global window. */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: String,
      posName: String = "shuffle_pos"): DataFrame =
    contiguousIdsBy(
      df.withColumn("_draw",
        md5(concat(lit(seed), col(idCol).cast("string")))),
      Seq(col("_draw"), col(idCol)), posName)
      .drop("_draw")

  /** Deterministic stratified sampling: exactly `n` rows per stratum
    * (fewer only when the stratum is smaller), chosen by ranking each
    * stratum on a content-stable hash draw ([[graft.functions.Hashing
    * .md5Long56]] over a salted id) — same id → same rank order on every
    * run and engine, so samples are reproducible and the oracle replays
    * them exactly.
    *
    * Scale shape: the `row_number <= n` filter over a partitioned window
    * is rewritten by Spark's WindowGroupLimit rule into a per-partition
    * top-n that keeps only n rows per map partition BEFORE the stratum
    * shuffle — each stratum never materializes more than
    * n × shuffle-partitions rows, so a 100 TB stratum costs a top-n scan,
    * not a full sort. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      n: Int, salt: String = "sample|"): DataFrame = {
    import graft.functions.Hashing
    val w = Window.partitionBy(strataCol).orderBy(
      Hashing.md5Long56(concat(lit(salt), col(idCol).cast("string"))),
      col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= n)
      .drop("_rk")
  }

  /** Deterministic WEIGHTED sampling without replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"): keep
    * the `n` items per group with the largest u^(1/w), where u is the
    * item's content-stable md5 uniform — the weighted upgrade of
    * [[stratifiedSample]] (sample by quality score, token count, dwell
    * time…). Ranked by ln(u)/w, the same order (ln is monotone and
    * w > 0) without a cross-engine `pow` in the plan; u = (h+1)/2⁵⁶
    * over [[graft.functions.Hashing.md5Long56]] lies in (0, 1], so the
    * key is finite. Weights are used as DOUBLES — fractional quality
    * scores weight faithfully (a long cast would truncate 0.9 → 0 and
    * collapse the draw to uniform) — and clamp to ≥ 1e-9 so a
    * zero/negative weight cannot divide to ±∞; same id + weight → same
    * draw on any engine or partitioning; the per-group top-n runs as a
    * WindowGroupLimit (bounded state), never a full sort. */
  def weightedSample(df: DataFrame, idCol: String, groupCol: String,
      weight: Column, n: Int, salt: String = "ws|"): DataFrame = {
    import graft.functions.Hashing
    val u = (Hashing.md5Long56(
      concat(lit(salt), col(idCol).cast("string"))) + 1).cast("double") /
      lit(72057594037927936.0) // 2^56, exact in double
    val key = log(u) / greatest(weight.cast("double"), lit(1e-9))
    val w = Window.partitionBy(groupCol).orderBy(key.desc, col(idCol))
    df.withColumn("_rk", row_number().over(w))
      .where(col("_rk") <= n)
      .drop("_rk")
  }

  /** Deterministic source-mixture sampling — the dataset-mixing primitive
    * (e.g. "30% web, 60% code, 10% wiki" for a training run): keep each
    * document with probability `weights(source)`, decided by a
    * content-stable uniform draw u(id) = md5-hash(id) mod 1e6 / 1e6
    * ([[Dedup.hash64Md5]], the DuckDB-portable hash — the oracle
    * recomputes the exact draw with `md5_number_upper`). Same id → same
    * draw on every run, engine, and partitioning, so mixtures are
    * reproducible and refreshes are incremental (new docs don't reshuffle
    * old decisions). Sources absent from `weights` are dropped (an
    * explicit mixture is a whitelist). Rows with a NULL id are dropped —
    * a content-stable draw needs content, and SQL agrees (NULL < w is
    * NULL → filtered); without the guard the hash UDF would NPE where
    * the SQL twin silently drops. Narrow per-row op — no shuffle. */
  /** GPT-style training-example assembly — the terminal artifact of the
    * tokenize-and-pack path: per group (the stream shard, e.g. source),
    * documents concatenate in id order with an `eosId` separator into
    * one token stream, which is cut into fixed `exampleLen`-token
    * examples that CROSS document boundaries (the standard pretraining
    * chunking; the last example of each group may be short).
    *
    * Emitted per example: (groupCol, example_idx, n_tokens, first_tok,
    * sum_ids) — counts and integer id sums, exact under any agg order,
    * so the q_train_examples oracle replays the whole composition
    * (pinned-rule BPE encode → offsets → chunking) hash-exactly.
    *
    * Scale shape: the per-doc offset is an exclusive prefix-sum window
    * partitioned by the group (the [[packShards]] discipline — packing
    * is sequential only within a shard, shards pack in parallel); then
    * one posexplode and one keyed two-phase agg. Token arrays never
    * shuffle: only (group, offset) ride the window, and the explode is
    * row-local. */
  def trainExamples(encoded: DataFrame, idCol: String, groupCol: String,
      idsCol: String = "input_ids", eosId: Int = 0,
      exampleLen: Int = 64): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // offsets computed over a NARROW (id, group, len) projection so the
    // token arrays never ride the window Exchange; the join back on the
    // id reuses encode's hash partitioning on that key
    val off = encoded
      .select(col(idCol), col(groupCol),
        (size(col(idsCol)) + 1).cast("long").as("_n1"))
      .withColumn("_off", coalesce(sum("_n1").over(w), lit(0L)))
      .select(col(idCol), col("_off"))
    encoded.join(off, Seq(idCol))
      .select(col(groupCol), col("_off"),
        posexplode(concat(col(idsCol), array(lit(eosId)))))
      .withColumn("_gpos", col("_off") + col("pos"))
      .withColumn("example_idx",
        floor(col("_gpos") / exampleLen).cast("long"))
      .groupBy(col(groupCol), col("example_idx"))
      .agg(count(lit(1)).as("n_tokens"),
        min_by(col("col"), col("_gpos")).cast("long").as("first_tok"),
        sum(col("col")).cast("long").as("sum_ids"))
  }

  /** Epoch/mixture planning — the LLaMA-style data-recipe table (Touvron
    * et al. 2023, table 1: per-source sampling proportion + epochs): given
    * target mixture weights and a total token budget, how many tokens
    * each source must contribute and how many passes (epochs) over the
    * available data that implies. Epochs > 1 flags upsampled (repeated)
    * sources; ≪ 1 means the source is subsampled.
    *
    * All-integer arithmetic so the cross-engine compare is exact: weights
    * arrive as parts-per-million, target_tokens = budget × w_ppm DIV 1e6,
    * epochs_ppm = target × 1e6 DIV tokens_avail, avail share likewise —
    * no float division anywhere.
    *
    * Plan shape: one narrow token-count pass → two-phase agg to a
    * group-cardinality-sized frame; the corpus total rides as a bounded
    * global window over that tiny frame (the [[temperatureSample]]
    * discipline); weights broadcast-join on the group key. */
  def epochPlan(docs: DataFrame, groupCol: String, tokens: Column,
      weightsPpm: Seq[(String, Long)], budgetTokens: Long): DataFrame = {
    require(weightsPpm.nonEmpty, "weightsPpm must be non-empty")
    // budget × w_ppm is computed before the DIV (exactness over Long),
    // so the product must not wrap: cap the budget at MaxValue/1e6
    // (~9.2e12 tokens) and fail loudly rather than silently overflow.
    require(budgetTokens >= 0 && budgetTokens <= Long.MaxValue / 1000000L,
      s"budgetTokens must be in [0, ${Long.MaxValue / 1000000L}] " +
        "(budget*1e6 must not overflow Long); got " + budgetTokens)
    val s = docs.sparkSession
    import s.implicits._
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val weights = weightsPpm.toDF(groupCol, "w_ppm")
    docs.select(col(groupCol), tokens.cast("long").as("_n"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum("_n").cast("long").as("tokens_avail"))
      .withColumn("_tot", sum("tokens_avail").over(w))
      .join(broadcast(weights), Seq(groupCol))
      .select(col(groupCol), col("n_docs"), col("tokens_avail"),
        expr("tokens_avail * 1000000L DIV _tot").as("avail_share_ppm"),
        expr(s"${budgetTokens}L * w_ppm DIV 1000000L").as("target_tokens"),
        expr(s"(${budgetTokens}L * w_ppm DIV 1000000L) * 1000000L " +
          "DIV tokens_avail").as("epochs_ppm"))
  }

  /** Temperature-based mixture sampling — the multilingual/multi-source
    * rebalancing rule of Raffel et al. 2020 §3.4.3 / Conneau et al. 2020
    * (XLM-R): a group with corpus share p_g is sampled so the OUTPUT
    * composition follows p_g^α (α < 1 upweights tail groups). The
    * data-dependent sibling of [[mixtureSample]]'s fixed keep rates.
    *
    * Determinism discipline: group weights are quantized to integers
    * (s_g = floor(p_g^α × 1e9)) BEFORE the normalizer sum, so the sum
    * commutes exactly under any agg order; each group's keep rate is one
    * double expression over exact integers (identical tree → identical
    * IEEE result in the oracle) and the row decision compares in integer
    * hash space: keep iff md5Long56(salt ∥ id) < floor(rate × 2⁵⁶).
    * With the default α = 0.5 the power is `sqrt` — IEEE-exact on both
    * engines, the case the q_mixture_temperature oracle pins; other α go
    * through `pow`, whose last ulp is libm-dependent (document before
    * gating such a config).
    *
    * Plan shape: group stats are a tiny two-phase agg; corpus totals and
    * the weight normalizer ride as global windows over the
    * group-cardinality-sized stats frame (bounded single-task windows —
    * the q_ccnet_bands precedent); the per-group threshold table
    * broadcast-joins back on the group key and the keep filter is
    * row-local — nothing after the scan shuffles corpus-sized data.
    * Keeps rows with their `keep_thresh` attached. */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double = 0.5, targetFrac: Double = 0.5,
      salt: String = "temp|"): DataFrame = {
    import graft.functions.Hashing
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    require(targetFrac > 0 && targetFrac <= 1, "targetFrac in (0, 1]")
    // the totals ride as GLOBAL windows over the stats frame — stats is
    // group-cardinality-sized (languages/sources: bounded small), so the
    // single-task window is bounded by design (the q_ccnet_bands
    // bounded-rank precedent) and avoids the self-join crossJoin
    // ambiguity of deriving scalar totals from the same lineage
    // column names must differ by more than case: Spark resolves
    // case-insensitively by default, so withColumn("_N") would REPLACE
    // "_n" and silently collapse every rate to targetFrac (caught by
    // DataPrepSpec's skewed fixture — the uniform-source gate corpus
    // cannot distinguish the two)
    val w = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rates = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_gn"))
      .withColumn("_ntot", sum("_gn").over(w))
      .withColumn("_gs", floor((
        if (alpha == 0.5) sqrt(col("_gn").cast("double") / col("_ntot"))
        else pow(col("_gn").cast("double") / col("_ntot"), alpha)) * 1e9)
        .cast("long"))
      .withColumn("_stot", sum("_gs").over(w))
      .withColumn("_rate", least(lit(1.0),
        lit(targetFrac) * col("_ntot").cast("double") *
          col("_gs").cast("double") /
          (col("_stot").cast("double") * col("_gn").cast("double"))))
      .select(col(groupCol),
        floor(col("_rate") * lit(72057594037927936.0)).cast("long")
          .as("keep_thresh"))
    df.join(broadcast(rates), Seq(groupCol))
      .where(Hashing.md5Long56(concat(lit(salt),
        col(idCol).cast("string"))) < col("keep_thresh"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022, "Efficient
    * Training of Language Models to Fill in the Middle"): with
    * probability `fimRate` per document, split the text at two points
    * and emit the PSM rendering
    * `<fim_prefix>P<fim_suffix>S<fim_middle>M` — the augmentation that
    * teaches a causal LM infilling (the code-model pretraining
    * staple); other documents pass through unchanged.
    *
    * Splits are CHARACTER-grain here (token-grain in a tokenized
    * pipeline — the plumbing is identical and the transform composes
    * with [[graft.operators.Tokenizer.encode]] downstream). The apply
    * draw and both cut points are portable md5 of the document id, so
    * the transform is deterministic, reproducible across runs and
    * engines, and the SQL oracle replays every emitted example
    * bit-for-bit. Pure column expressions — narrow projection, zero
    * shuffles, codegen end to end.
    *
    * Reassembly invariant (spec-pinned): for applied rows,
    * prefix + middle + suffix == the original text. Null text passes
    * through null with fim_applied = false.
    *
    * @return (idCol, fim_applied, text_out) */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
      fimRate: Double = 0.5): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1, s"fimRate=$fimRate outside [0,1]")
    val c = col(textCol)
    val n = length(c).cast("long")
    def h(salt: String) = graft.functions.Hashing.md5Long56(
      concat(lit(salt), col(idCol).cast("string")))
    val applied = c.isNotNull &&
      pmod(h("fim|"), lit(1000000L)) <
        lit(math.floor(fimRate * 1e6).toLong)
    val a = pmod(h("fimA|"), n + 1L)
    val b = pmod(h("fimB|"), n + 1L)
    val p1 = least(a, b)
    val p2 = greatest(a, b)
    val psm = concat(
      lit("<fim_prefix>"), c.substr(lit(1L), p1),
      lit("<fim_suffix>"), c.substr(p2 + 1L, n - p2),
      lit("<fim_middle>"), c.substr(p1 + 1L, p2 - p1))
    docs.select(col(idCol), applied.as("fim_applied"),
      when(applied, psm).otherwise(c).as("text_out"))
  }

  /** DPO/RLHF preference-pair construction: within each `keyCol` group
    * (a prompt id, topic bucket, or dedup cluster), rank candidates by
    * the exact-integer `scoreCol` (desc, id asc tiebreak) and pair the
    * i-th best with the i-th worst (ranks i and n+1−i, i ≤ n/2),
    * dropping equal-score pairs — the deterministic chosen/rejected
    * frame with the preference margin attached.
    *
    * Shape at 100 TB: ONE scan — the two window functions share one
    * keyed shuffle, each row tags itself with its mirror pair index
    * least(r, n+1−r), and the exactly-2-row (key, pair_idx) groups
    * collapse with min_by/max_by partial aggregation (a self-join
    * formulation would scan and shuffle the ranked frame twice). A
    * k-row group emits ≤ k/2 pairs, so no per-group blowup. Integer
    * scores, not floats: cross-engine-stable ordering and an exact
    * margin.
    *
    * @return (pair_key, pair_idx, chosen_id, rejected_id, margin) */
  def preferencePairs(df: DataFrame, keyCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val base = df.select(col(keyCol).as("pair_key"), col(idCol).as("id"),
      col(scoreCol).cast("long").as("score"))
    val wRank = Window.partitionBy("pair_key")
      .orderBy(col("score").desc, col("id"))
    val ranked = base
      .withColumn("r", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("pair_key")))
    // rank i and its mirror n+1-i share pair_idx = min of the two; the
    // odd-group middle (2r = n+1) fails the <= n guard and drops out
    ranked
      .withColumn("pair_idx", least(col("r"), col("n") - col("r") + 1L))
      .where(col("pair_idx") * 2 <= col("n"))
      .groupBy("pair_key", "pair_idx")
      .agg(min_by(col("id"), col("r")).as("chosen_id"),
        min_by(col("score"), col("r")).as("chosen_score"),
        max_by(col("id"), col("r")).as("rejected_id"),
        max_by(col("score"), col("r")).as("rejected_score"))
      .where(col("chosen_score") > col("rejected_score"))
      .select(col("pair_key"), col("pair_idx"), col("chosen_id"),
        col("rejected_id"),
        (col("chosen_score") - col("rejected_score")).as("margin"))
  }

  /** GRPO-style group-relative advantage normalization (the
    * group-baseline trick of DeepSeek's GRPO — Shao et al. 2024,
    * "DeepSeekMath": advantage = (score − group mean) / group std,
    * replacing a learned value baseline with the group statistic):
    * per `groupCol` group of integer-scored samples, emit
    *
    *   adv_q = floor( (n·x − Σx) · 10⁶ / sqrt(n·Σx² − (Σx)²) )
    *
    * — algebraically (x − mean)/σ_pop quantized at 10⁻⁶. The
    * numerator and the radicand are EXACT integers off one keyed
    * window (three aggregates share the one shuffle), and the only
    * float ops are a single correctly-rounded sqrt and divide, so the
    * quantized advantage replays bit-for-bit in SQL. Zero-variance
    * groups (all members at the mean — includes singletons) emit 0.
    *
    * Long bound (KernelProperties convention): the radicand n·Σx²
    * wraps past 2⁶³, so the kernel is safe while n·max|x|² ·n ≤ 2⁶³,
    * i.e. n·max|x| ≤ 3·10⁹ — e.g. 10⁵-member groups at |x| ≤ 3·10⁴,
    * or prefScore-scale scores (≤ 10⁶) in groups ≤ 3·10³.
    *
    * NULL scores are EXCLUDED up front (a null row would inflate the
    * count(1) window while the sum windows skip it — silently wrong
    * statistics for the group's real members — and would itself emit
    * a null advantage).
    *
    * @return (idCol, groupCol, scoreCol, adv_q) row per non-null-score
    *         input row */
  def groupAdvantages(df0: DataFrame, idCol: String, groupCol: String,
      scoreCol: String): DataFrame = {
    // the kAnonymize/applyChangelog collision convention: withColumn
    // would silently OVERWRITE a caller column named adv_q, and the
    // select(*) projection would raise a confusing duplicate-name
    // AnalysisException if any temp name already exists — fail fast
    // with the actual contract instead (r12 advice)
    Seq("adv_q", "_n", "_s1", "_s2").foreach { c =>
      require(!df0.columns.contains(c),
        s"groupAdvantages: input already has a '$c' column — rename " +
          "it first; the operator writes its statistics there")
    }
    val df = df0.where(col(scoreCol).isNotNull)
    val w = Window.partitionBy(groupCol)
    val x = col(scoreCol).cast("long")
    // one projection for all three aggregates -> ONE Window node over
    // the single keyed exchange (separate withColumns plan as three
    // stacked Window operators)
    df.select(col("*"),
        count(lit(1)).over(w).as("_n"),
        sum(x).over(w).as("_s1"),
        sum(x * x).over(w).as("_s2"))
      .withColumn("adv_q",
        when(col("_n") * col("_s2") === col("_s1") * col("_s1"), 0L)
          .otherwise(floor(
            (col("_n") * x - col("_s1")).cast("double") * 1e6 /
              sqrt((col("_n") * col("_s2") - col("_s1") * col("_s1"))
                .cast("double"))).cast("long")))
      .select(col(idCol), col(groupCol), col(scoreCol), col("adv_q"))
  }

  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "mixture needs at least one source weight")
    require(weights.values.forall(w => w >= 0 && w <= 1),
      "weights are keep probabilities in [0, 1]")
    val drawUdf = udf { (id: String) =>
      if (id == null) null
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        java.lang.Double.valueOf(java.lang.Long.remainderUnsigned(
          graft.operators.Dedup.hash64Md5(md, id), 1000000L).toDouble / 1e6)
      }
    }
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(0.0)) {
      case (acc, (src, p)) => when(col(sourceCol) === src, lit(p))
        .otherwise(acc)
    }
    df.where(col(idCol).isNotNull)
      .withColumn("_u", drawUdf(col(idCol).cast("string")))
      .where(col("_u") < w)
      .drop("_u")
  }

  /** Curriculum ordering (Bengio et al. 2009): stage the corpus
    * easy-to-hard by a difficulty band while ROUND-ROBIN interleaving
    * sources within each band, so no band front-loads one domain (the
    * classic curriculum failure: "easy" is dominated by one source and
    * early training sees a single distribution). Difficulty buckets by
    * FIXED integer thresholds on `difficulty` (a config, like every
    * curriculum schedule) — deliberately not quantile banding, which
    * would need a global sort/window; fixed thresholds keep the plan
    * one keyed shuffle at any corpus size.
    *
    * The curriculum IS the lexicographic order of the emitted columns
    * (band, interleave_rank, sourceCol, idCol): consumers
    * `ORDER BY` those four, and the per-(band, source) `interleave_rank`
    * (row_number by (difficulty, id) — deterministic, engine-exact over
    * integer difficulties) realizes the round-robin. No global order
    * index column on purpose: that would be a single-partition window;
    * the sort keys carry the same information and distribute.
    *
    * Scale shape: ONE exchange — the (band, source) window shuffle;
    * banding is a narrow per-row projection. */
  def curriculumOrder(df: DataFrame, idCol: String, sourceCol: String,
      difficulty: Column, bandWidth: Long, maxBand: Int): DataFrame = {
    require(bandWidth >= 1, s"bandWidth=$bandWidth must be >= 1")
    require(maxBand >= 0, s"maxBand=$maxBand must be >= 0")
    val w = Window.partitionBy(col("band"), col(sourceCol))
      .orderBy(col("_difficulty"), col(idCol))
    df.withColumn("_difficulty",
        greatest(difficulty.cast("long"), lit(0L)))
      // integer `div`, never float `/`+cast — exact at any magnitude
      .withColumn("band",
        least(expr(s"_difficulty div $bandWidth"), lit(maxBand.toLong)))
      .withColumn("interleave_rank", row_number().over(w).cast("long"))
      .drop("_difficulty")
  }
}
