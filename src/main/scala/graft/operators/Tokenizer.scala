package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted

/** Distributed tokenizer-training primitives: the byte-pair-encoding
  * pipeline of Sennrich et al. 2016 ("Neural Machine Translation of Rare
  * Words with Subword Units"), restructured for Spark's execution model.
  *
  * The scale design is the whole point: the corpus is reduced ONCE to a
  * weighted word vocabulary — the only corpus-sized shuffle, and it gets
  * map-side partial aggregation for free — and every BPE iteration after
  * that runs on the vocabulary alone. At 100 TB the corpus holds ~10^11
  * running words but the distinct-word vocab is ~10^7 rows, so each merge
  * costs a vocab-sized job, not a corpus pass. (This mirrors how the
  * published BPE implementations train from a pre-counted word-frequency
  * dict rather than raw text; here the dict is a DataFrame and the merge
  * loop keeps the connectedComponents persist discipline so lineage and
  * recompute stay constant per iteration.)
  */
object Tokenizer {

  /** Distinct-word count above which a segmented-vocab table stops
    * being broadcast back onto the corpus and joins keyed instead. A
    * web-scale corpus holds 10⁷–10⁸ distinct "words" (typo/URL/number
    * tails) — at ~100 bytes a row the forced broadcast that was here
    * before r11 would ship a multi-GB table to every executor and OOM
    * the driver building it. 5 M rows ≈ a few hundred MB serialized,
    * the upper edge of a sane broadcast. Overridable per session via
    * `graft.tokenizer.maxBroadcastWords` (specs use it to force the
    * keyed path at test scale). */
  val MaxBroadcastWordsDefault: Long = 5000000L

  private def maxBroadcastWords(df: DataFrame): Long =
    df.sparkSession.conf.getOption("graft.tokenizer.maxBroadcastWords")
      .map(_.toLong).getOrElse(MaxBroadcastWordsDefault)

  /** Join a per-distinct-word table (`word` + derived columns) back
    * onto corpus-grain `words` rows: broadcast below
    * [[MaxBroadcastWordsDefault]] distinct words (zero corpus-side
    * exchange — the common case), keyed join above it (the corpus
    * shuffles once on `word`; AQE handles the skewed hot words). The
    * table is persisted (Caches-tracked) so the sizing count() pays the
    * per-distinct-word segmentation kernel exactly once.
    *
    * EAGERNESS NOTE (r11): the sizing count() runs AT PLAN-CONSTRUCTION
    * TIME, so every operator routing through here (segmentCorpus,
    * encode, WordPiece.encodeStats, UnigramLm encode) now triggers the
    * distinct + segmentation jobs when the plan is BUILT, not when it
    * is executed — the price of choosing the join strategy from the
    * real vocabulary size rather than a static estimate. Callers that
    * only want the plan shape should stub the threshold conf. */
  private[operators] def joinByWord(words: DataFrame,
      segTable: DataFrame): DataFrame = {
    val seg = segTable.persistTracked
    // past the threshold, hint MERGE explicitly: Catalyst's static size
    // estimate for a cached-but-unmaterialized distinct can undershoot
    // the autoBroadcast threshold and re-introduce the forced broadcast
    // this fallback exists to prevent
    val right =
      if (seg.count() <= maxBroadcastWords(words)) broadcast(seg)
      else seg.hint("merge")
    words.join(right, Seq("word"))
  }

  /** Weighted word vocabulary: (word, freq), lower-cased, whitespace
    * tokenization. The one corpus-sized aggregation of the pipeline. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** First-iteration BPE statistics straight off the corpus: adjacent
    * character-pair counts weighted by word frequency, the quantity the
    * first merge decision ranks. Emitted as `(pair, n)` with the pair
    * rendered "l r" (space-joined), ordered by count then pair so the
    * top-`k` cut is total-ordered and engine-portable. Pure composition:
    * corpus → word-freq shuffle → vocab-local pair explode → vocab-sized
    * re-agg. */
  def bpePairCounts(docs: DataFrame, textCol: String,
      topK: Int = 50): DataFrame =
    wordFreq(docs, textCol)
      .where(length(col("word")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(1), length(col("word")) - 1),
        i => concat(col("word").substr(i, lit(1)), lit(" "),
          col("word").substr(i + 1, lit(1))))).as("pair"))
      .groupBy("pair")
      .agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)

  /** Adjacent symbol pairs of a vocab row, weighted by `freq`: the
    * per-iteration merge statistics. `symbols` is an array column. */
  private def pairStats(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("symbols")) >= 2)
      .select(col("freq"), explode(transform(
        sequence(lit(0), size(col("symbols")) - 2),
        i => struct(
          element_at(col("symbols"), i + 1).as("left"),
          element_at(col("symbols"), i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum("freq").as("n"))

  /** Greedy left-to-right application of one merge (left,right)→left+right
    * over a symbol array, as a codegen'd `aggregate` fold (no UDF): the
    * accumulator rebuilds the array, fusing a pair only when the previous
    * emitted symbol is `left` and the current is `right`. Because the fused
    * symbol becomes the new "previous", overlapping occurrences resolve
    * left-to-right exactly like the reference BPE implementations
    * ("aaaa" + merge (a,a) → ["aa","aa"], not ["aa","a","a"]). */
  private def applyMerge(symbols: Column, left: String,
      right: String): Column =
    aggregate(
      symbols,
      array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 &&
            get(acc, size(acc) - 1) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(lit(left + right))))
        .otherwise(concat(acc, array(x))))

  /** Learn `merges` BPE merge rules from the corpus. Returns the learned
    * rules in application order. `eow` (when non-empty) is appended to each
    * word as the classic end-of-word symbol so learned subwords distinguish
    * word-final position.
    *
    * BPE is inherently sequential — each merge depends on the previous —
    * so the loop runs `merges` vocab-sized jobs from the driver. Iteration
    * discipline matches [[Dedup.connectedComponents]]: each round's vocab
    * is persisted and the previous round's cache dropped, and the plan is
    * localCheckpoint'ed every few rounds so lineage depth (and driver
    * analysis time) stays constant instead of growing per merge. */
  def bpeTrain(docs: DataFrame, textCol: String, merges: Int,
      eow: String = "</w>", minPairCount: Long = 2): Seq[(String, String)] = {
    import org.apache.spark.storage.StorageLevel
    val base = wordFreq(docs, textCol)
    val initSymbols = {
      val chars = filter(split(col("word"), ""), s => length(s) > 0)
      if (eow.isEmpty) chars else concat(chars, array(lit(eow)))
    }
    var vocab = base.select(initSymbols.as("symbols"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Release handle for the CURRENT round's materialization. Checkpoint
    // rounds truncate lineage via RDD.localCheckpoint on the row RDD we
    // hold here — Dataset.localCheckpoint would store its blocks outside
    // the CacheManager, making Dataset.unpersist a silent no-op and
    // leaking one vocab-sized block set per 8 merges over a long run.
    var release: () => Unit = { val v = vocab; () => { v.unpersist(false); () } }
    var learned = List.empty[(String, String)]
    var round = 0
    var done = false
    while (round < merges && !done) {
      val top = pairStats(vocab)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("n") < minPairCount) done = true
      else {
        val (l, r) = (top(0).getAs[String]("left"),
          top(0).getAs[String]("right"))
        learned ::= (l, r)
        val next = vocab
          .select(applyMerge(col("symbols"), l, r).as("symbols"), col("freq"))
        val (kept, keptRelease): (DataFrame, () => Unit) =
          if ((round + 1) % 8 == 0) {
            val rows = next.rdd // plain RDD: lineage cut + explicit blocks
            rows.localCheckpoint()
            (docs.sparkSession.createDataFrame(rows, next.schema),
              () => { rows.unpersist(false); () })
          } else {
            val df = next.persist(StorageLevel.MEMORY_AND_DISK)
            (df, () => { df.unpersist(false); () })
          }
        kept.count() // materialize before dropping the parent blocks
        release()
        vocab = kept
        release = keptRelease
      }
      round += 1
    }
    release()
    learned.reverse
  }

  /** Corpus-scale subword segmentation with learned rules: segment the
    * DISTINCT words (one [[segment]] per vocab row — the only place the
    * sequential merge logic runs), then broadcast-join the subword arrays
    * back onto the corpus' exploded words. Returns (idCol, word,
    * subwords). At 100 TB the segmentation cost is vocab-sized and the
    * corpus pays one broadcast hash join — the same "reduce to the vocab
    * first" shape as training. */
  def segmentCorpus(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)], eow: String = "</w>"): DataFrame = {
    val segUdf = udf((w: String) => segment(w, rules, eow))
    val words = docs
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .where(length(col("word")) > 0)
    val vocabSeg = words.select("word").distinct()
      .withColumn("subwords", segUdf(col("word")))
    joinByWord(words, vocabSeg)
      .select(col(idCol), col("word"), col("subwords"))
  }

  /** Per-subword-occurrence positions: (idCol, _widx, _sidx, subword),
    * one row per subword occurrence, with explicit (word index, subword
    * index) keys — NOT stream-order ids — so downstream reassembly order
    * survives any partitioning/AQE re-plan. Segmentation itself runs
    * once per DISTINCT word ([[segmentCorpus]]'s reduce-to-the-vocab
    * shape); the corpus pays one broadcast join and two narrow explodes. */
  private def tokenPositions(docs: DataFrame, idCol: String,
      textCol: String, rules: Seq[(String, String)],
      eow: String): DataFrame = {
    val segUdf = udf((w: String) => segment(w, rules, eow))
    val words = docs
      .select(col(idCol), posexplode(filter(
        split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)))
      .withColumnRenamed("pos", "_widx")
      .withColumnRenamed("col", "word")
    val vocabSeg = words.select("word").distinct()
      .withColumn("subwords", segUdf(col("word")))
    joinByWord(words, vocabSeg)
      .select(col(idCol), col("_widx"), posexplode(col("subwords")))
      .withColumnRenamed("pos", "_sidx")
      .withColumnRenamed("col", "subword")
  }

  /** Gather positioned subword ids into per-document arrays: the one
    * unavoidable keyed shuffle (ids must reach their document). */
  private def gatherIds(tok: DataFrame, vocab: DataFrame, idCol: String,
      unkId: Int): DataFrame =
    tok
      .join(broadcast(vocab.select("subword", "tok_id")), Seq("subword"),
        "left")
      .select(col(idCol), col("_widx"), col("_sidx"),
        coalesce(col("tok_id"), lit(unkId)).as("tok_id"))
      .groupBy(idCol)
      .agg(transform(
        array_sort(collect_list(struct(col("_widx"), col("_sidx"),
          col("tok_id")))),
        x => x.getField("tok_id").cast("int")).as("input_ids"))

  /** Text → token-id sequences: segment the corpus with learned rules,
    * then map subwords to contiguous integer ids from a deterministic
    * vocab (subwords ranked by corpus frequency desc, then
    * lexicographically; unknown subwords — impossible when the vocab was
    * built by this same call chain, possible with a foreign vocab — map
    * to `unkId`). Returns (idCol, input_ids: array<int>) with one row per
    * document, subwords in document word order.
    *
    * The corpus is segmented ONCE: the positioned-subword frame is
    * persisted and serves both the vocab ranking counts and the
    * per-document gather. The round-8 version instead re-derived the
    * ranking counts through a second full [[vocabulary]] pass — an
    * entire extra segment-the-corpus subtree per encode (measured
    * 5.9 s vs 3.0 s at sf0.1). Persist-once beats segment-twice at any
    * scale where the tokenized corpus spills to disk cheaper than it
    * recomputes, which is every scale here: the persisted projection is
    * 4 narrow columns, while the recompute replays scan + split +
    * two explodes + the broadcast join. Callers that already hold a
    * vocab should use [[encodeWith]] (single pass, no persist). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)], eow: String = "</w>",
      unkId: Int = 0): DataFrame =
    encodeAndVocab(docs, idCol, textCol, rules, eow, unkId)._1

  /** [[encode]] that also returns the (subword, tok_id) vocabulary it
    * assigned against — both outputs share ONE segmentation of the
    * corpus (the persisted positioned-subword frame). Callers needing
    * encode + vocab together (an encode→decode round trip, exporting
    * the id map beside the ids) would otherwise pay a separate
    * [[vocabulary]] call, i.e. a second full segment-the-corpus
    * subtree (measured: the round trip dropped 7.2 s → ~4 s at sf0.1
    * when its vocab stopped being a second pass). */
  def encodeAndVocab(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)], eow: String = "</w>",
      unkId: Int = 0): (DataFrame, DataFrame) = {
    val tok = tokenPositions(docs, idCol, textCol, rules, eow)
      .persistTracked
    // identical counts to [[vocabulary]]'s (same segmentation, same
    // words), so the ranking — and the oracle — cannot drift
    val subwordCounts = tok
      .groupBy("subword").agg(count(lit(1)).as("n"))
      .persistTracked
    val vocabIds = DataPrep.contiguousIdsBy(subwordCounts,
        Seq(col("n").desc, col("subword")), "tok_id", startAt = 1L)
      .select(col("subword"), col("tok_id"))
    (gatherIds(tok, vocabIds, idCol, unkId), vocabIds)
  }

  /** [[encode]] against a caller-supplied (subword, tok_id) vocabulary
    * — e.g. one [[vocabulary]] result shared between encode and
    * [[decode]] in a round-trip, or a foreign vocab with unknowns.
    * Exactly one corpus segmentation pass and one keyed shuffle; no
    * persist (nothing is read twice). */
  def encodeWith(docs: DataFrame, idCol: String, textCol: String,
      rules: Seq[(String, String)], vocab: DataFrame,
      eow: String = "</w>", unkId: Int = 0): DataFrame =
    gatherIds(tokenPositions(docs, idCol, textCol, rules, eow), vocab,
      idCol, unkId)

  /** The deterministic id vocabulary [[encode]] assigns against:
    * (subword, tok_id) with ids 1..V ranked by corpus frequency desc,
    * then lexicographically. Built the scale-correct way — the corpus
    * reduces to a persisted vocab-sized count table, then
    * [[DataPrep.contiguousIdsBy]] (range-repartition + zipWithIndex)
    * ranks it; a `row_number` global window would funnel the vocab
    * through one task. The persist matters: zipWithIndex runs an eager
    * per-partition count job before its stamped pass, so an unpersisted
    * input would pay the corpus-sized explode+agg subtree twice
    * (measured 5.4 s vs 4.5 s at sf0.1). */
  def vocabulary(docs: DataFrame, textCol: String,
      rules: Seq[(String, String)], eow: String = "</w>"): DataFrame = {
    val segUdf = udf((w: String) => segment(w, rules, eow))
    val words = docs
      .select(explode(filter(
        split(lower(trim(col(textCol))), "\\s+"),
        t => length(t) > 0)).as("word"))
    val vocabSeg = words.select("word").distinct()
      .withColumn("subwords", segUdf(col("word")))
    val subwordCounts = joinByWord(words, vocabSeg)
      .select(explode(col("subwords")).as("subword"))
      .groupBy("subword").agg(count(lit(1)).as("n"))
      .persistTracked
    DataPrep.contiguousIdsBy(subwordCounts,
        Seq(col("n").desc, col("subword")), "tok_id", startAt = 1L)
      .select(col("subword"), col("tok_id"))
  }

  /** Token-id sequences → text: the inverse of [[encode]] given the
    * same [[vocabulary]]. Ids join back to subwords (vocab-sized →
    * broadcast), per-document order is kept by explicit position keys,
    * subwords concatenate and the `eow` markers become the word
    * separators — so `decode(encode(docs), vocabulary(docs))` equals
    * the whitespace-normalized lower-cased corpus exactly (the
    * q_bpe_roundtrip gate). One keyed shuffle (the per-doc gather),
    * mirror of encode's. Caveat: a corpus word containing the literal
    * `eow` string would corrupt the reassembly — the standard BPE
    * end-of-word-marker collision, inherited from the paper's scheme.
    * Returns (idCol, text). */
  def decode(encoded: DataFrame, idCol: String, idsCol: String,
      vocab: DataFrame, eow: String = "</w>"): DataFrame = {
    val pos = encoded
      .select(col(idCol), posexplode(col(idsCol)))
      .withColumnRenamed("pos", "_p")
      .withColumnRenamed("col", "tok_id")
    pos.join(broadcast(vocab.select("subword", "tok_id")), Seq("tok_id"))
      .groupBy(idCol)
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("_p"), col("subword")))),
        x => x.getField("subword"))).as("_joined"))
      .select(col(idCol),
        trim(replace(col("_joined"), lit(eow), lit(" "))).as("text"))
  }

  /** Segment a word with learned merge rules (applied in training order) —
    * the inference twin of [[bpeTrain]], used by the spec to pin the
    * classic fixture end-to-end. Plain Scala on one word; corpus-scale
    * segmentation would map this over the vocab then broadcast-join words
    * to subwords. */
  def segment(word: String, rules: Seq[(String, String)],
      eow: String = "</w>"): Seq[String] = {
    var syms: Seq[String] =
      word.map(_.toString) ++ (if (eow.isEmpty) Nil else Seq(eow))
    rules.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      syms.foreach { s =>
        if (out.nonEmpty && out.last == l && s == r)
          out(out.length - 1) = l + r
        else out += s
      }
      syms = out.toSeq
    }
    syms
  }
}
