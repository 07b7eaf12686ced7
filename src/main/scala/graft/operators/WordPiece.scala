package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenization (Wu et al. 2016; the BERT tokenizer) — the
  * third member of the tokenizer family beside BPE ([[Tokenizer]]) and
  * the Unigram LM ([[UnigramLm]]): greedy longest-match-first
  * ("maximal munch") segmentation against a vocabulary of word-initial
  * pieces and `##`-prefixed continuation pieces, with BERT's exact
  * whole-word `[UNK]` rules — no piece matches at the current
  * position, or the word exceeds `maxCharsPerWord`
  * (`max_input_chars_per_word` in the reference implementation).
  *
  * Documented deviation (the hard-EM/GBT discipline): the real
  * WordPiece VOCABULARY is trained by likelihood gain; here the vocab
  * is frequency-ranked — every single-character piece seen in training
  * (both forms) plus the top `vocabMulti` multi-character pieces by
  * (occurrence-weight DESC, piece ASC). The ENCODER is the faithful
  * part, and runs identically against any externally supplied vocab.
  *
  * Scale shape (the BPE-encode pattern): the greedy kernel runs once
  * per DISTINCT word — word-shaped corpora reduce 10⁹ tokens to a
  * vocab-sized word table — and rides back on a broadcast join; the
  * only corpus-sized moves are the word explode and the per-doc
  * regather, both keyed by doc. Vocab selection is
  * `orderBy(...).limit(k)` (TakeOrderedAndProject — per-partition
  * top-k then merge, no global window, no full sort). The collected
  * vocab Set is bounded (≤ chars + vocabMulti entries — the IVF-sample
  * discipline).
  *
  * The DuckDB oracle replays training rank-for-rank and the greedy
  * march step-for-step as an UNROLLED `maxCharsPerWord`-deep CTE chain
  * (each step consumes ≥ 1 char, so the unroll covers every non-UNK
  * word — the q_pagerank unrolled-iteration precedent).
  */
object WordPiece {

  val MaxPieceLen = 8
  val MaxCharsPerWord = 24
  val Unk = "[UNK]"

  /** lower/trim/whitespace-split words, one row per token occurrence:
    * (idCol, wp [1-based word position], word). */
  def words(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(filter(split(lower(trim(col(textCol))), "\\s+"),
          w => length(w) > 0)).as(Seq("_wp0", "word")))
      .select(col(idCol), (col("_wp0") + 1).as("wp"), col("word"))

  /** All candidate pieces of a word column, as the oracle extracts
    * them: for every start p and length l ≤ [[MaxPieceLen]], the
    * substring, `##`-prefixed when p > 1; de-duplicated per word. */
  private def piecesOf(word: Column): Column =
    array_distinct(flatten(
      transform(sequence(lit(1), length(word)), p =>
        transform(
          sequence(lit(1), least(lit(MaxPieceLen), length(word) - p + 1)),
          l => when(p === 1, word.substr(p, l))
            .otherwise(concat(lit("##"), word.substr(p, l)))))))

  /** Frequency-ranked vocabulary: (piece). Single-char pieces (raw
    * length 1, either form) are always kept — they make every training
    * word encodable; multi-char pieces rank by total occurrence weight
    * (Σ word-count over words containing the piece) DESC, piece ASC,
    * top `vocabMulti`.
    *
    * Lookup semantics note (BERT-faithful, WordPieceSpec pins it): the
    * vocabulary is a FLAT string set, exactly like the reference
    * tokenizer's — so for a word that literally starts with "##", a
    * continuation-form entry can match word-initially (the candidate
    * string is identical). The oracle joins on exact piece equality
    * for the same reason; an is_cont flag would deviate from both. */
  def trainVocab(docs: DataFrame, textCol: String,
      vocabMulti: Int = 300): DataFrame =
    vocabFromWords(
      words(docs.select(col(textCol)), textCol /* unused id */, textCol)
        .select("word"),
      vocabMulti)

  private def vocabFromWords(w: DataFrame, vocabMulti: Int): DataFrame = {
    val wc = w.groupBy("word").agg(count(lit(1)).as("c"))
    val pieceWeights = wc
      .select(explode(piecesOf(col("word"))).as("piece"), col("c"))
      .groupBy("piece").agg(sum("c").as("weight"))
    val single = pieceWeights
      .where(length(regexp_replace(col("piece"), "^##", "")) === 1)
      .select("piece")
    val multi = pieceWeights
      .where(length(regexp_replace(col("piece"), "^##", "")) > 1)
      .orderBy(col("weight").desc, col("piece"))
      .limit(vocabMulti)
      .select("piece")
    single.unionByName(multi)
  }

  /** The greedy longest-match kernel, per word (runs on DISTINCT words
    * only — see the object scaladoc). Returns the piece sequence, or
    * Seq([[Unk]]) under either BERT UNK rule. */
  private[graft] def segment(word: String,
      vocab: Set[String]): Seq[String] = {
    if (word.length > MaxCharsPerWord) return Seq(Unk)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var l = math.min(MaxPieceLen, word.length - pos)
      var hit: String = null
      while (l >= 1 && hit == null) {
        val cand = (if (pos > 0) "##" else "") +
          word.substring(pos, pos + l)
        if (vocab(cand)) hit = cand else l -= 1
      }
      if (hit == null) return Seq(Unk)
      out += hit
      pos += l
    }
    out.toSeq
  }

  /** Encode the corpus against a trained (or supplied) vocabulary and
    * roll up per document: (idCol, n_words, n_pieces, n_unk_words,
    * pieces_text) with pieces in word order, space-joined. */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
      vocabMulti: Int = 300): DataFrame = {
    import graft.operators.Caches.Persisted
    // ONE corpus tokenization pass: the persisted token frame feeds
    // BOTH the vocab-training action and the encode join — without the
    // persist, trainVocab's collect re-runs the regex-split explode
    // over every document (review finding r10; the q_skipgram_pairs
    // kept-CACHED discipline)
    val tokens = words(docs, idCol, textCol).persistTracked
    // bounded driver collect: ≤ distinct-chars·2 + vocabMulti pieces
    val vocab = vocabFromWords(tokens.select("word"), vocabMulti)
      .collect().map(_.getString(0)).toSet
    val segUdf = udf((w: String) => {
      val ps = segment(w, vocab)
      (ps.length, if (ps == Seq(Unk)) 1 else 0, ps.mkString(" "))
    })
    val enc = tokens.select("word").distinct()
      .withColumn("_e", segUdf(col("word")))
      .select(col("word"), col("_e._1").as("_np"),
        col("_e._2").as("_unk"), col("_e._3").as("_ps"))
    // broadcast-to-keyed fallback past ~5M distinct words (Tokenizer's
    // shared threshold) — same join-back shape as segmentCorpus
    Tokenizer.joinByWord(tokens, enc)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_words"),
        sum("_np").cast("long").as("n_pieces"),
        sum("_unk").cast("long").as("n_unk_words"),
        array_join(transform(
          array_sort(collect_list(struct(col("wp"), col("_ps")))),
          s => s.getField("_ps")), " ").as("pieces_text"))
  }
}
