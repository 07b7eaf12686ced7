package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted
import graft.functions.TextFunctions

/** Document deduplication at corpus scale — exact, bag-of-words,
  * duplicated-span, MinHash-LSH, SimHash, and embedding-cosine variants,
  * plus the checkpointed connected-components closure and the SemDeDup
  * composition (the beyond-parity LLM-data-pipeline operator set).
  *
  * Scale design notes:
  *  - exact dedup: hash-groupBy on a 64-bit fingerprint — one shuffle of
  *    (fingerprint, id) pairs only, never of document text;
  *  - MinHash-LSH: signatures and band keys are computed per-row
  *    (narrow), candidate pairs come from a self-join on (band, bandHash)
  *    — the classic shuffle-on-bucket-key plan whose cost scales with
  *    bucket occupancy, not corpus²;
  *  - SimHash: 64-bit signature per row; near-dup candidates share one of
  *    four 16-bit chunks (Hamming ≤ 3 ⇒ some chunk equal by pigeonhole);
  *  - verification (exact Jaccard / Hamming) runs only on candidate pairs.
  */
object Dedup {

  /** Exact duplicates by normalized-text fingerprint: returns
    * (fingerprint, canonical_id = min id, n_dups) groups with > 1 member.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol),
        TextFunctions.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)

  /** Bag-of-words duplicates: like [[exactDupGroups]] but the key is the
    * md5 of the SORTED token multiset, so word-order shuffles (a common
    * scraped-content permutation exact dedup misses) land in one group.
    * Sorting is per-row (array_sort of the token array); only the 32-byte
    * key and id shuffle. Returns (canonical_id, n_bow_dups), groups > 1. */
  def bowDupGroups(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol),
        md5(concat_ws(" ", array_sort(filter(
          split(lower(trim(col(textCol))), "\\s+"),
          t => length(t) > 0))).cast("binary")).as("bow"))
      .groupBy("bow")
      .agg(min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_bow_dups"))
      .where(col("n_bow_dups") > 1)

  /** Per-document duplicated-span statistics (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): for
    * each doc, how many of its distinct word `n`-grams also appear in at
    * least one OTHER document. Grams leave the scan as 8-byte xxhash64
    * keys — the shuffle carries (doc_id, hash) pairs, never text (the
    * q_ngram_span_dedup plan, packaged as a reusable operator). Returns
    * (idCol, n_grams, n_dup_grams, dup_frac); docs shorter than one
    * gram get no row. */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val t = docs.select(col(idCol),
      split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
        .as("tk"))
    val grams = t.where(size(col("tk")) >= n)
      .select(col(idCol), explode(array_distinct(transform(
        sequence(lit(0), size(col("tk")) - n),
        i => xxhash64(concat_ws(" ", slice(col("tk"), i + 1, lit(n))))
      ))).as("gh"))
      .persistTracked // feeds shared-agg + join-back
    val shared = grams.groupBy("gh")
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= 2)
    val perDoc = grams.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
    val dupPerDoc = grams.join(shared.select("gh"), Seq("gh"))
      .groupBy(idCol).agg(count(lit(1)).as("n_dup_grams"))
    perDoc.join(dupPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        (coalesce(col("n_dup_grams"), lit(0L)).cast("double") /
          col("n_grams")).as("dup_frac"))
  }

  /** Drop documents whose duplicated-span fraction exceeds
    * `maxDupFraction` — the practical action on [[spanDupStats]] (keep
    * docs that are mostly original; docs too short to have a gram are
    * kept). */
  def dropSpanDups(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, maxDupFraction: Double = 0.5): DataFrame = {
    val flagged = spanDupStats(docs, idCol, textCol, n)
      .where(col("dup_frac") > maxDupFraction)
      .select(idCol)
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** Maximal duplicated-substring spans — the suffix-array half of Lee
    * et al. 2022's ExactSubstr dedup, re-expressed Spark-first. A
    * substring is duplicated when it occurs at >= 2 token positions
    * anywhere in the corpus (a doc repeating its own phrase counts,
    * unlike [[spanDupStats]]' cross-doc signal). Every position emits
    * its forward `minLen`-token gram as an 8-byte xxhash64; grams with
    * >= 2 corpus occurrences mark their covering token range
    * duplicated, and per doc the overlapping/adjacent ranges merge into
    * MAXIMAL spans by gaps-and-islands. This recovers exactly the
    * suffix-array answer at the >= minLen grain: a duplicated span of
    * length L >= minLen is precisely a run of L − minLen + 1
    * consecutive duplicated minLen-grams, and the maximal merge
    * reassembles it with exact token boundaries. The suffix array
    * itself is replaced by a hash-count — the Spark-shaped trade: two
    * keyed shuffles of (id, pos, hash) triples instead of one global
    * sorted structure no cluster primitive builds incrementally.
    *
    * Returns (idCol, span_start, span_end): half-open token-index
    * ranges over the whitespace-normalized lower-cased token array, one
    * row per maximal span.
    *
    * `keepOne = true` applies Lee et al.'s actual policy: one occurrence
    * per duplicate chain survives — the chain's least (id, pos)
    * occurrence is canonical and is NOT reported as duplicated. Costs
    * one per-chain argmin folded into the same keyed agg
    * (min(struct(id, pos)) rides the count shuffle; no extra pass).
    * Default false = strip-all (strictly safer against memorization,
    * but changes corpus statistics vs the paper — both policies are a
    * filter over the same chain table). */
  def exactSubstrSpans(docs: DataFrame, idCol: String, textCol: String,
      minLen: Int = 8, keepOne: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col(idCol),
      split(regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
        .as("tk"))
    // one (id, pos, hash) triple per token position — hashed before the
    // shuffle so text never leaves the scan; persisted for the
    // shared-count + join-back branches (the q_ngram_span_dedup
    // discipline: 24-byte triples, tokenize once)
    val pos = t.where(size(col("tk")) >= minLen)
      .select(col(idCol), col("tk"),
        explode(sequence(lit(0), size(col("tk")) - minLen)).as("p"))
      .select(col(idCol), col("p"),
        xxhash64(concat_ws(" ",
          slice(col("tk"), col("p") + 1, lit(minLen)))).as("gh"))
      .persistTracked
    val dupPos =
      if (keepOne) {
        // per-chain argmin rides the count agg: the least (id, pos)
        // occurrence is canonical and filtered OUT of the dup set
        val chains = pos.groupBy("gh")
          .agg(count(lit(1)).as("n"),
            min(struct(col(idCol).as("_cid"), col("p").as("_cp")))
              .as("_mn"))
          .where(col("n") >= 2)
        pos.join(chains.select("gh", "_mn"), Seq("gh"))
          .where(!(col(idCol) === col("_mn._cid") &&
            col("p") === col("_mn._cp")))
      } else {
        val dup = pos.groupBy("gh").agg(count(lit(1)).as("n"))
          .where(col("n") >= 2)
        pos.join(dup.select("gh"), Seq("gh"))
      }
    // gaps-and-islands over each doc's duplicated positions: ranges
    // [p, p+minLen) and [q, q+minLen) merge iff q <= p + minLen
    val w = Window.partitionBy(col(idCol)).orderBy("p")
    dupPos
      .withColumn("_brk",
        when(col("p") > lag("p", 1).over(w) + minLen, 1).otherwise(0))
      .withColumn("_island", sum("_brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_island"))
      .agg(min(col("p")).as("span_start"),
        (max(col("p")) + minLen).as("span_end"))
      .select(col(idCol), col("span_start"), col("span_end"))
  }

  /** Rebuild each document with every maximal duplicated span removed —
    * the cut action on [[exactSubstrSpans]]. Default `keepOne = false`
    * removes ALL occurrences (strictly safer against memorization);
    * `keepOne = true` is Lee et al.'s published policy — each duplicate
    * chain's least-(id, pos) occurrence survives the cut (the argmin
    * rides the chain-count agg, see [[exactSubstrSpans]]).
    * Surviving tokens rejoin with single spaces (the span
    * indices are defined over the whitespace-normalized token array, so
    * the output text is normalized too). Docs with no span pass through
    * with their original text. The per-row index filter is a HOF over
    * the doc's OWN span list (a few entries) — O(len · spans)
    * interpreted, but with no corpus-sized subtree re-evaluated per
    * element, which is what made HOFs a trap elsewhere. */
  def stripExactSubstrSpans(docs: DataFrame, idCol: String,
      textCol: String, minLen: Int = 8,
      keepOne: Boolean = false): DataFrame = {
    val spans = exactSubstrSpans(docs, idCol, textCol, minLen, keepOne)
      .groupBy(idCol)
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("_spans"))
    val tk = split(
      regexp_replace(lower(trim(col(textCol))), "\\s+", " "), " ")
    docs.join(spans, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("_spans").isNull, col(textCol))
          .otherwise(concat_ws(" ", filter(tk, (t, i) =>
            !exists(col("_spans"), s =>
              i >= s.getField("span_start") &&
                i < s.getField("span_end"))))))
      .drop("_spans")
  }

  /** Keep one row per exact-duplicate group (the min-id row). */
  def dropExactDups(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val keep = docs
      .select(col(idCol).as("_id"),
        TextFunctions.fingerprint(col(textCol)).as("_fp"))
      .groupBy("_fp").agg(min("_id").as(idCol))
      .drop("_fp")
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** MinHash signature of a shingle array: `numHashes` permutation
    * approximations g_i(x) = a_i·h(x) + b_i over a single 64-bit base hash
    * (the standard hash-once-remix construction — Broder 1997 resemblance
    * sketches). One pass per row: N higher-order `transform` passes would
    * run interpreted per element and dominate the whole dedup (measured
    * ~40× slower at sf0.1), so this is a deliberate Scala kernel.
    */
  def minhashSig(shingles: Seq[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach(sh => remixMin(sig, hash64(sh), numHashes))
    sig
  }

  /** Same signature, computed from PRE-HASHED shingles. The signature
    * is a pure function of the base-hash SET (min is invariant under
    * duplicates), so minhash over a stored `distinct` hash array —
    * [[DedupIndex]]'s grams table — equals minhash over the original
    * shingle multiset. This is what lets the persisted index DERIVE
    * its bands table from its grams table instead of re-executing the
    * source frame. */
  def minhashSigFromHashes(hashes: Seq[Long], numHashes: Int)
      : Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    hashes.foreach(remixMin(sig, _, numHashes))
    sig
  }

  @inline private def remixMin(sig: Array[Long], h: Long,
      numHashes: Int): Unit = {
    var i = 0
    while (i < numHashes) {
      // splitmix64-style odd multipliers keyed by i
      val a = 0x9e3779b97f4a7c15L * (2 * i + 1)
      val b = 0xbf58476d1ce4e5b9L * (i + 1)
      val v = a * h + b
      if (v < sig(i)) sig(i) = v
      i += 1
    }
  }

  private val minhashSigUdf = udf(
    (sh: Seq[String], n: Int) => minhashSig(sh, n))

  private val minhashSigFromHashesUdf = udf(
    (hs: Seq[Long], n: Int) => minhashSigFromHashes(hs, n))

  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    minhashSigUdf(shingleCol, lit(numHashes))

  def minhashSignatureFromHashes(hashesCol: Column,
      numHashes: Int): Column =
    minhashSigFromHashesUdf(hashesCol, lit(numHashes))

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and emit one (band_idx, band_hash) per band. */
  def bandKeys(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(concat_ws("_",
          (0 until rowsPerBand).map(r =>
            sigCol.getItem(b * rowsPerBand + r).cast("string")): _*))
          .as("bh"))
    }: _*)

  /** Probability that LSH banding catches a pair of Jaccard
    * similarity `s`: 1 − (1 − s^r)^b (the standard S-curve). Driver
    * math, no Spark — use it to budget recall before picking banding
    * parameters. */
  def lshCatchProbability(s: Double, bands: Int, rowsPerBand: Int)
      : Double = {
    require(s >= 0 && s <= 1, s"similarity $s outside [0,1]")
    require(bands >= 1 && rowsPerBand >= 1, "bands/rows must be >= 1")
    1.0 - math.pow(1.0 - math.pow(s, rowsPerBand), bands)
  }

  /** Pick (bands, rowsPerBand) for a fixed signature length: the
    * FEWEST-bands factorization of `numHashes` whose catch probability
    * at `threshold` is ≥ `minCatch` — fewer bands = fewer exploded key
    * rows = a cheaper banding shuffle, so take the cheapest plan that
    * meets the recall budget. Returns None when no factorization
    * qualifies (raise numHashes). This is the calculation behind
    * q_dedup_index_probe's 16×2 choice: at threshold 0.5 the default
    * 8×4 misses a j=0.69 pair ~13% of the time while 16×2 misses it
    * ≤ 3·10⁻⁵. */
  def lshPlanFor(threshold: Double, numHashes: Int,
      minCatch: Double = 0.999): Option[(Int, Int)] = {
    require(threshold > 0 && threshold <= 1,
      s"threshold $threshold outside (0,1]")
    (1 to numHashes)
      .filter(numHashes % _ == 0)
      .map(b => (b, numHashes / b))
      .find { case (b, r) =>
        lshCatchProbability(threshold, b, r) >= minCatch
      }
  }

  /** THE band-key pipeline — shingle array column → exploded
    * (idCol, band, bh) triples — shared by every banding consumer
    * (self-join dedup, cross-corpus decontamination, the persisted
    * [[DedupIndex]]): one definition, so the persisted index's keys can
    * never desynchronize from the live paths. */
  private[operators] def bandTriples(sh: DataFrame, idCol: String,
      shCol: String, bands: Int, rowsPerBand: Int): DataFrame =
    bandsOf(sh, idCol,
      minhashSignature(col(shCol), bands * rowsPerBand),
      bands, rowsPerBand)

  /** [[bandTriples]] over PRE-HASHED shingle sets (the persisted
    * [[DedupIndex]] grams layout) — identical keys by the
    * [[minhashSigFromHashes]] set-invariance argument. `carry` names
    * extra input columns to pass through unchanged (the v2→v3 bands
    * migration carries the grams' `epoch` partition value so each
    * band row lands back beside its own epoch). */
  private[operators] def bandTriplesFromHashes(g: DataFrame, idCol: String,
      hashesCol: String, bands: Int, rowsPerBand: Int,
      carry: Seq[String] = Nil): DataFrame =
    bandsOf(g, idCol,
      minhashSignatureFromHashes(col(hashesCol), bands * rowsPerBand),
      bands, rowsPerBand, carry)

  private def bandsOf(df: DataFrame, idCol: String, sig: Column,
      bands: Int, rowsPerBand: Int, carry: Seq[String] = Nil): DataFrame = {
    val carried = carry.map(col)
    df.select(col(idCol) +: carried :+ sig.as("sig"): _*)
      .select(col(idCol) +: carried :+
        explode(bandKeys(col("sig"), bands, rowsPerBand)).as("bk"): _*)
      .select(col(idCol) +: carried :+ col("bk.band").as("band") :+
        col("bk.bh").as("bh"): _*)
  }

  /** MinHash-LSH near-duplicate candidate pairs with exact-Jaccard
    * verification. Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold. The result is EAGERLY materialized (computed
    * at call time, localCheckpoint-backed) and the internal shingle
    * cache is released before returning — see the note at the end of
    * the method body.
    *
    * Hot-band flood guard: a band key shared by k documents mints
    * k·(k−1)/2 candidate pairs — a 10⁴-copy boilerplate template would
    * mint 5·10⁷ pairs from ONE key and melt the verification join (the
    * q_containment df-cap scenario, at the band grain). Band keys with
    * document frequency > `maxBandDf` therefore switch from all-pairs
    * to STAR pairing: every member is paired with the key's minimum id
    * only — k−1 candidates instead of k²/2. A star (not a sorted
    * adjacency CHAIN) on purpose: downstream
    * [[connectedComponents]] is min-label propagation, O(diameter)
    * rounds — a 10⁴-member chain needs 10⁴ rounds while the star's
    * diameter is 2, so the cluster closes in the usual handful.
    * Recall trade, documented: within a hot key the PAIR list is no
    * longer complete (only hub–member pairs survive), but a hot key is
    * near-always a mutual near-dup cluster, so the star keeps it
    * CONNECTED and CC / canonical-pick recover the full cluster
    * transitively; pairs are still exact-Jaccard verified, so no false
    * positive can ride the star. Cold keys (df ≤ `maxBandDf`, the
    * overwhelming majority) are unaffected.
    *
    * @param shingleSize character shingle width
    * @param bands × rowsPerBand = signature length; tune for the
    *              threshold via the usual (1/b)^(1/r) rule
    * @param maxBandDf band-key document frequency above which candidate
    *                  generation degrades to hub–member star pairing
    */
  def minhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8,
      shingler: Column => Column = TextFunctions.wordShingles(_, 3),
      bands: Int = 8, rowsPerBand: Int = 4,
      maxBandDf: Long = 100): DataFrame = {
    // Shingle sets are big (hundreds of strings per doc) — keep them OUT
    // of the banding shuffle. Band keys travel as (id, band, bh) triples
    // only; shingles are re-joined just for the (few) candidate pairs.
    // Word shingles are the default unit: on vocabulary-dense corpora,
    // character shingles make random pairs ~0.4-similar and banding then
    // floods the candidate set (measured 60+s vs ~4s at sf0.1).
    // The shingle table feeds three plan branches (banding + both sides of
    // the verification join); persist it so the shingling runs once.
    // (At warehouse scale this would be a materialized intermediate table.)
    val sh = docs.select(
      col(idCol).as("id"),
      shingler(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
      .persistTracked

    // persisted: the band table has FOUR consumers (flood-guard probe +
    // both self-join sides, and the hot star join when the guard fires);
    // the probe action populates the cache, so the signature UDF runs
    // exactly ONCE per document — the r9 shape ran it once per join
    // side. (bands+1)·n rows of 20 bytes — far below the shingle cache.
    val bandsDf = bandTriples(sh, "id", "sh", bands, rowsPerBand)
      .persistTracked

    // try/finally: the operator runs ACTIONS (probe collect +
    // checkpoint), so a mid-flight failure must still release the
    // corpus-sized shingle and band caches (review finding r10)
    try {
      // Flood-guard PROBE: one map-side-combined agg over the band keys
      // finds every key with df > maxBandDf. The operator is already
      // eager (the result is localCheckpoint'ed below), so a driver-side
      // probe action fits its contract; its cost is one banding pass over
      // the cached shingles — far below the self-join it guards at any
      // scale. Three probe outcomes:
      //  - no hot keys (the overwhelmingly common corpus): run EXACTLY
      //    the unguarded self-join — the guard costs only the probe;
      //  - few hot keys: ship them as a broadcast local relation — the
      //    anti/star joins are broadcast-hash, no extra shuffle;
      //  - degenerate corpora (> 100k hot keys — boilerplate-dominated):
      //    same plan with the key-stats frame kept distributed (keyed
      //    joins, AQE decides).
      val hotLimit = 100000
      val hotStats = bandsDf.groupBy("band", "bh")
        .agg(count(lit(1)).as("_df"), min(col("id")).as("_hub"))
        .where(col("_df") > maxBandDf)
        .select("band", "bh", "_hub")
      val hotLocal = hotStats.limit(hotLimit + 1).collect()
      val cands =
        if (hotLocal.isEmpty) {
          // the r9 plan, verbatim: two-sided self-join on the band key
          bandsDf.select(col("id").as("id_a"), col("band"), col("bh"))
            .join(bandsDf.select(col("id").as("id_b"), col("band"),
              col("bh")), Seq("band", "bh"))
            .where(col("id_a") < col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates("id_a", "id_b")
        } else {
          val spark = docs.sparkSession
          val hotDf =
            if (hotLocal.length <= hotLimit)
              broadcast(spark.createDataFrame(
                java.util.Arrays.asList(hotLocal: _*),
                hotStats.schema))
            else hotStats // degenerate: stay distributed, keyed joins
          val cold = bandsDf.join(hotDf.select("band", "bh"),
            Seq("band", "bh"), "left_anti")
          val coldPairs = cold
            .select(col("id").as("id_a"), col("band"), col("bh"))
            .join(cold.select(col("id").as("id_b"), col("band"), col("bh")),
              Seq("band", "bh"))
            .where(col("id_a") < col("id_b"))
            .select("id_a", "id_b")
          // hot keys: hub–member star — k−1 pairs, never k²/2, and
          // diameter 2 for the CC that follows; hub = min id, so
          // id_a < id_b by construction
          val hotPairs = bandsDf.join(hotDf, Seq("band", "bh"))
            .where(col("id") =!= col("_hub"))
            .select(col("_hub").as("id_a"), col("id").as("id_b"))
          coldPairs.unionByName(hotPairs)
            .dropDuplicates("id_a", "id_b")
        }

      val verified = cands
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
        .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
        .where(col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
      // Materialize the (small — verified near-dup pairs only) result
      // eagerly and release the shingle cache before returning. Two
      // reasons, both measured: (a) every downstream consumer of a pair
      // list is multi-branch (connectedComponents' symmetric union,
      // pageRank's edge union read it TWICE in one job), and a lazy
      // result lets both branches race the whole bands+verify pipeline
      // into an unpopulated cache — ~2× pair-gen cost; (b) the shingle
      // table is corpus-sized and this was the library's largest
      // unreleased cache. Callers get a flat-lineage frame and zero
      // storage-memory residue (the checkpoint blocks are freed by the
      // ContextCleaner when the frame is dropped).
      verified.localCheckpoint()
    } finally {
      sh.unpersist(false)
      bandsDf.unpersist(false)
    }
  }

  /** Cross-corpus MinHash-LSH near-duplicate pairs: every `corpus` row
    * whose shingle-set Jaccard against some `reference` row is >=
    * `threshold`, with the exact verified similarity. This is benchmark
    * DECONTAMINATION at near-dup grain (GPT-3 §C / Llama-style): the
    * n-gram-overlap check (`DataPrep.contaminationFlags`) catches exact
    * spans, this catches paraphrased / lightly-edited benchmark copies.
    *
    * Scale shape — the asymmetry is the whole design: `reference` (the
    * benchmark suite) is tiny (10³–10⁶ docs) while `corpus` is the
    * 100 TB side. Both sides are banded, then candidates come from a
    * BROADCAST hash join of the corpus band table against the reference
    * band table — the corpus never shuffles, not for banding and not
    * for verification (reference shingle sets broadcast too). There is
    * no self-join and no k²/2 hot-key blowup: a band key matching k
    * corpus docs emits k·df_ref(key) candidates, linear in the corpus.
    * Each candidate is exact-Jaccard verified, so banding flukes cannot
    * flag a clean document.
    *
    * Returns (id, ref_id, jaccard), one row per contaminated
    * (corpus, reference) pair. Lazy (no persist: the corpus side is
    * consumed once per plan branch; shingling runs once for banding and
    * once for the verify join of the few candidates — cheaper than
    * caching a 100 TB shingle table).
    *
    * @param threshold   exact-Jaccard cut after verification
    * @param shingler    shingle unit (default word trigrams — the
    *                    [[minhashDupPairs]] contract)
    * @param bands×rowsPerBand  signature geometry; (1/b)^(1/r) rule
    */
  def minhashCrossDupPairs(corpus: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.8,
      shingler: Column => Column = TextFunctions.wordShingles(_, 3),
      bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    def shingled(df: DataFrame, out: String): DataFrame = df.select(
      col(idCol).as(out), shingler(col(textCol)).as(s"_sh_$out"))
      .where(size(col(s"_sh_$out")) > 0)
    def banded(sh: DataFrame, out: String): DataFrame =
      bandTriples(sh, out, s"_sh_$out", bands, rowsPerBand)

    val corpusSh = shingled(corpus, "id")
    val refSh = shingled(reference, "ref_id")
    // the reference side is computed twice (bands + verify join) — both
    // passes are over the small side, and both ship as broadcasts
    val cands = banded(corpusSh, "id")
      .join(broadcast(banded(refSh, "ref_id")), Seq("band", "bh"))
      .select("id", "ref_id")
      .dropDuplicates("id", "ref_id")
    cands
      .join(corpusSh, Seq("id"))
      .join(broadcast(refSh), Seq("ref_id"))
      .withColumn("jaccard", jaccard(col("_sh_id"), col("_sh_ref_id")))
      .where(col("jaccard") >= threshold)
      .select("id", "ref_id", "jaccard")
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union === 0, 1.0).otherwise(inter / union)
  }

  /** 64-bit SimHash kernel: bit j of the signature is the sign of
    * sum over shingles of (bit j of hash64(shingle) ? +1 : -1)
    * (Charikar 2002, "Similarity estimation techniques from rounding
    * algorithms"). A per-row pure function — a 64-wide expression fold
    * would wreck codegen, so this one is a deterministic Scala UDF.
    */
  def simHash64(shingles: Seq[String]): Long =
    simHashWith(shingles, hash64)

  /** SimHash over the PORTABLE md5-derived shingle hash ([[hash64Md5]]):
    * bit-identical recomputable in DuckDB (`md5_number_upper`), which is
    * what lets the q_simhash_pairs oracle verify the whole operator —
    * including blocking completeness — against an all-pairs SQL truth.
    * ~2× slower per shingle than the murmur path; use for verification
    * corpora, keep the default for production throughput. */
  def simHash64Md5(shingles: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    simHashWith(shingles, s => hash64Md5(md, s))
  }

  private def simHashWith(shingles: Seq[String],
      hash: String => Long): Long = {
    val counts = new Array[Int](64)
    shingles.foreach { sh =>
      val h = hash(sh)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) != 0) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** First 8 bytes of MD5(UTF-8), little-endian, as a signed long — the
    * exact bits of DuckDB's `md5_number_upper(s)` (mod 2^64), so any
    * construction over this hash has a SQL-recomputable oracle twin. */
  def hash64Md5(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 7
    while (i >= 0) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
    h
  }

  /** Stable 64-bit string hash (two seeded 32-bit MurmurHash3 halves). */
  private[operators] def hash64(s: String): Long = {
    import scala.util.hashing.MurmurHash3
    val hi = MurmurHash3.stringHash(s, 0x9747b28c)
    val lo = MurmurHash3.stringHash(s, 0x85ebca6b)
    (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
  }

  val simhashUdf = udf(simHash64 _)
  val simhashMd5Udf = udf(simHash64Md5 _)

  def simhash(shingleCol: Column): Column = simhashUdf(shingleCol)
  def simhashPortable(shingleCol: Column): Column = simhashMd5Udf(shingleCol)

  /** Hamming distance between two 64-bit signatures — builtin bit ops,
    * codegen'd. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidate pairs: signatures within `maxHamming`.
    * Pigeonhole blocking on `maxHamming + 1` chunks of the 64-bit
    * signature (≤ maxHamming differing bits can touch at most maxHamming
    * chunks, so some chunk is identical) keeps the self-join keyed, never
    * all-pairs. Chunk count scales with the radius: maxHamming 3 → four
    * 16-bit chunks, maxHamming 7 → eight 8-bit chunks, any value < 64
    * works (wider radius → shorter chunks → bigger buckets → more
    * verification pairs, the standard multi-chunk trade). */
  def simhashDupPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, shingleSize: Int = 5,
      portableHash: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      "pigeonhole blocking needs 0 <= maxHamming < 64")
    val nChunks = maxHamming + 1
    // near-equal chunk widths covering all 64 bits
    val bounds = (0 to nChunks).map(c => c * 64 / nChunks)
    val sigFn: Column => Column =
      if (portableHash) simhashPortable else simhash
    val sigs = docs.select(col(idCol).as("id"),
      sigFn(TextFunctions.shingles(col(textCol), shingleSize)).as("sig"))
    val chunked = sigs.withColumn("ck",
      explode(array((0 until nChunks).map { c =>
        val lo = bounds(c)
        val width = bounds(c + 1) - lo
        val mask = if (width == 64) -1L else (1L << width) - 1L
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("sig"), lo)
            .bitwiseAND(lit(mask)).as("ch"))
      }: _*)))
      .select(col("id"), col("sig"), col("ck.chunk"), col("ck.ch"))
    val a = chunked.select(col("id").as("id_a"), col("sig").as("sig_a"),
      col("chunk"), col("ch"))
    val b = chunked.select(col("id").as("id_b"), col("sig").as("sig_b"),
      col("chunk"), col("ch"))
    a.join(b, Seq("chunk", "ch"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs, scale path: candidates come
    * from a keyed self-join on a random-hyperplane LSH bucket
    * ([[SimilaritySearch.lshSignature]]), exact cosine verifies each
    * candidate — never an all-pairs cross product. Bit-identical vectors
    * (the typical exact-dup case) always share a bucket, so recall on
    * exact copies is 1 at any `bits`; near-but-not-identical pairs trade
    * recall for bucket size via `bits` (fewer bits → bigger buckets).
    */
  /** Transitive closure of near-duplicate pairs: connected components by
    * iterative min-label propagation — the step that turns pair lists
    * into canonical-document clusters. Each iteration is one join + one
    * min-aggregation (both keyed — the classic large-graph CC plan, label
    * count halves every round, ~log(diameter) iterations; dup clusters
    * are shallow so this converges in a handful). Deterministic: the
    * canonical id is the component's minimum id.
    *
    * @param vertices one column `idCol`
    * @param pairs    columns id_a, id_b (undirected)
    * @return (idCol, component) — component = min id reachable
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      idCol: String, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // persisted PRE-PARTITIONED by src (the pageRankNanos discipline):
    // every iteration's labels⋈sym join requires clustering on src, and
    // an unpartitioned cache re-shuffled the (larger) edge side once per
    // round — partitioning it once here removes one exchange per
    // iteration at any scale (r17 optimization, guide §2.4)
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"),
        col("id_a").as("dst")))
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col(idCol).as("id"),
      col(idCol).as("component"))
    val compType = labels.schema("component").dataType
    // Iteration discipline (the difference between "correct at sf0.01"
    // and "runs at 100 TB"): each round's labels are persisted and the
    // previous round's cache is dropped, so every iteration touches ONLY
    // the previous iteration's materialized labels — never re-derives the
    // chain from the scan. The convergence test is folded into the same
    // pass that materializes the new labels: the old component rides
    // through the min-aggregation as a carried column, and ONE aggregate
    // action both populates the cache and returns the changed-row count
    // (no second job re-walking history). Every few iterations the plan
    // is localCheckpoint'ed so logical-plan depth — and with it driver
    // analysis time — stays constant instead of growing per round.
    var cached: List[DataFrame] = Nil
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val viaEdges = labels.join(sym, col("id") === col("src"))
        .select(col("dst").as("id"), col("component"))
      // `old` is non-null on exactly the one labels-row per id (dst ids of
      // sym are vertices too), so min() recovers it through the groupBy
      val next = labels
        .select(col("id"), col("component"), col("component").as("old"))
        .unionByName(viaEdges
          .select(col("id"), col("component"),
            lit(null).cast(compType).as("old")))
        .groupBy("id")
        .agg(min("component").as("component"), min("old").as("old"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next
        .agg(count(when(col("component") =!= col("old"), 1)).as("c"))
        .head().getLong(0)
      cached.foreach(_.unpersist(false))
      cached = List(next)
      labels =
        if ((it + 1) % 5 == 0) {
          // truncate lineage: analysis cost would otherwise grow per round
          val chk = next.select("id", "component").localCheckpoint()
          next.unpersist(false)
          cached = Nil
          chk
        } else next.select("id", "component")
      converged = changed == 0
      it += 1
    }
    // materialize the answer once (eager), then release every cached
    // iteration — callers get a flat-lineage frame, not a cache leak
    val result = labels.select(col("id").as(idCol), col("component"))
      .localCheckpoint()
    cached.foreach(_.unpersist(false))
    sym.unpersist(false)
    result
  }

  /** End-to-end near-dedup: MinHash pairs → components → keep only each
    * cluster's canonical (minimum-id) document. */
  def dropNearDups(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = minhashDupPairs(docs, idCol, textCol, threshold)
    val canonical = connectedComponents(
        docs.select(col(idCol)), pairs, idCol)
      .where(col(idCol) === col("component"))
      .select(idCol)
    docs.join(canonical, Seq(idCol), "left_semi")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, "SemDeDup: Data-
    * efficient learning at web-scale through semantic deduplication"):
    * embedding-cosine near-dup pairs → connected components → keep only
    * each semantic cluster's canonical (minimum-id) row. The pair stage
    * is the LSH-bucketed keyed join of [[embeddingDupPairs]] (never
    * all-pairs) and the closure reuses the checkpointed
    * [[connectedComponents]], so the whole composition is scale-safe. */
  def dropEmbeddingDups(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.99, bits: Int = 16): DataFrame = {
    val pairs = embeddingDupPairs(df, idCol, vecCol, threshold, bits)
    val canonical = connectedComponents(
        df.select(col(idCol)), pairs, idCol)
      .where(col(idCol) === col("component"))
      .select(idCol)
    df.join(canonical, Seq(idCol), "left_semi")
  }

  /** Corpus-level exact LINE deduplication — the MassiveText / RefinedWeb
    * "remove duplicated lines across documents" step (Rae et al. 2021
    * §A.1.2; Penedo et al. 2023): every distinct line keeps only its
    * first occurrence (min doc id, then min line index) and all other
    * copies are dropped; documents are reassembled from their surviving
    * lines in original order.
    *
    * Scale shape: lines leave the scan as 8-byte xxhash64 keys, so the
    * argmin shuffle carries (hash, doc, idx) — never text; the argmin's
    * output is itself the keep-set, regrouped by doc into surviving line
    * INDICES (two keyed shuffles total), and the final text is rebuilt
    * row-locally by indexing the doc's own line array. Line text crosses
    * no shuffle anywhere. The oracle replays the same argmin keyed by
    * the line TEXT itself, proving the hashed plan lossless (up to
    * xxhash64 collisions, ~n²/2⁶⁴).
    *
    * Returns (idCol, n_lines, n_kept_lines, cleaned_text) for every
    * input doc (docs with no surviving lines get 0 / empty string). */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // compact key table: (doc, idx, hash) — 20 bytes/line. The argmin's
    // output IS the keep-set — (hash, keep_doc, keep_idx) — so no join
    // back to the line table is needed; regroup it by doc directly.
    val lines = docs
      .select(col(idCol).as("_doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("_idx", "_line")))
      .select(col("_doc"), col("_idx"), xxhash64(col("_line")).as("_h"))
    val keptIdx = lines.groupBy("_h")
      .agg(min_by(struct(col("_doc"), col("_idx")),
        struct(col("_doc"), col("_idx"))).as("_k"))
      .groupBy(col("_k._doc").as(idCol))
      .agg(sort_array(collect_list(col("_k._idx"))).as("_keep"))
    // Rebuild join: the docs side rides the join exchange as the FLAT
    // text column, not a pre-split string array — an array of n lines
    // pays per-element offsets/nulls through the shuffle writer and
    // measured 1.7× on the whole operator at sf0.1. The split happens
    // ONCE per row post-join: `_lns` is an alias referenced three times
    // below, so CollapseProject keeps the non-cheap split() in its own
    // projection instead of inlining it — in particular it can NOT leak
    // into the rebuild lambda, which would re-split the doc per kept
    // line (the corpus-sized-subtree-per-element HOF trap, see
    // stripExactSubstrSpans). LineDedupSpec pins the single-split plan.
    docs.select(col(idCol), col(textCol))
      .join(keptIdx, Seq(idCol), "left")
      .withColumn("_lns", split(col(textCol), "\n"))
      .select(col(idCol),
        size(col("_lns")).cast("long").as("n_lines"),
        coalesce(size(col("_keep")), lit(0)).cast("long")
          .as("n_kept_lines"),
        array_join(transform(coalesce(col("_keep"), lit(Array.emptyIntArray)),
          i => element_at(col("_lns"), i + 1)), "\n")
          .as("cleaned_text"))
  }

  /** N-gram novelty per document — the incremental-crawl curation
    * metric: what fraction of a doc's (distinct) word n-grams appear
    * for the FIRST time in this doc, taking document id as ingestion
    * order. A re-crawled boilerplate page scores ~0; genuinely new
    * content scores high — the cheap corpus-level complement to
    * pairwise near-dup detection (no pairs are ever formed).
    *
    * Scale shape: grams leave the scan as 7-byte portable md5 hashes
    * ([[graft.functions.Hashing.md5Long56]] — SQL-replayable), so both
    * keyed shuffles (per-gram min-doc agg, join-back) carry ≤ 16-byte
    * rows; gram text never rides an Exchange (the lineDedup
    * discipline). Returns (idCol, n_grams, n_novel, novelty_ppm) with
    * novelty_ppm an exact integer division; docs with fewer than n
    * words have no grams and are absent. */
  def gramNovelty(docs: DataFrame, idCol: String, textCol: String,
      shingler: Column => Column = TextFunctions.wordShingles(_, 3))
      : DataFrame = {
    val grams = docs.select(col(idCol).as("_doc"),
        explode(shingler(col(textCol))).as("_g"))
      .select(col("_doc"),
        graft.functions.Hashing.md5Long56(col("_g")).as("_h"))
      // shingles are distinct per doc already; dedup again at the HASH
      // grain so a (vanishing) md5 collision counts once on both sides
      .dropDuplicates("_doc", "_h")
    val first = grams.groupBy("_h").agg(min("_doc").as("_first"))
    grams.join(first, Seq("_h"))
      .groupBy(col("_doc").as(idCol))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("_doc") === col("_first"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
  }

  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.99, bits: Int = 16): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val e = df.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", SimilaritySearch.lshSignature(col("v"), bits))
    val a = e.select(col("id").as("id_a"), col("v").as("v_a"), col("bucket"))
    val b = e.select(col("id").as("id_b"), col("v").as("v_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", SimilaritySearch.cosine(col("v_a"), col("v_b")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
