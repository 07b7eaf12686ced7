package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** One-call training-data curation: the end-to-end pipeline a user of the
  * reference would otherwise assemble by hand from this library's pieces
  * (the q_curation_funnel rules, the dedup family, decontamination), in
  * the order that is cheap at 100 TB:
  *
  *  1. narrow per-row filters FIRST (language, quality, repetition — no
  *     shuffle) so every later shuffle sees the smallest possible corpus;
  *  2. PII scrubbing (narrow rewrite, keeps the row);
  *  3. exact dedup (fingerprint groupBy — and doing it BEFORE minhash
  *     also defuses the hot-bucket hazard: n identical docs would share
  *     every LSH band key and enumerate n² candidate pairs);
  *  4. MinHash near-dedup on the surviving canonical set;
  *  5. benchmark decontamination (corpus grams vs a broadcast benchmark
  *     gram set — never doc × doc).
  *
  * Each stage is the already-oracle-checked operator; this object only
  * fixes the composition order and surfaces a per-stage count report.
  */
object Curation {

  /** Filter thresholds mirroring the curation-funnel defaults.
    * `compressionBand` is the Gopher-style deflate-ratio window (too
    * compressible = loop spam beyond the n-gram horizon, too
    * incompressible = noise) — `None` disables it. `bowDedup` extends
    * exact dedup to word-order permutations. */
  case class Rules(
      langs: Set[String] = Set("en"),
      minQuality: Double = 0.3,
      maxRepetition: Double = 0.2,
      compressionBand: Option[(Double, Double)] = None,
      bowDedup: Boolean = false,
      nearDupThreshold: Double = 0.8,
      decontaminateMinOverlap: Long = 2)

  /** The narrow per-row rule predicate — shared with
    * [[graft.streaming.StreamingCuration]] so batch and stream apply the
    * SAME filter stack (one definition; no drift as rules grow). */
  private[graft] def passesFilters(textCol: Column, rules: Rules): Column = {
    val base =
      TextFunctions.langId(textCol).isInCollection(rules.langs) &&
        TextFunctions.qualityScore(textCol) >= rules.minQuality &&
        TextFunctions.repetitionRatio(textCol) <= rules.maxRepetition
    rules.compressionBand match {
      case None => base
      case Some((lo, hi)) =>
        val cr = TextFunctions.compressionRatio(textCol)
        base && cr >= lo && cr <= hi
    }
  }

  /** Keep one row per bag-of-words group (min-id canonical) — the
    * word-order-insensitive sibling of [[Dedup.dropExactDups]]. */
  private def dropBowDups(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val keep = docs
      .select(col(idCol).as("_id"),
        md5(concat_ws(" ", array_sort(filter(
          split(lower(trim(col(textCol))), "\\s+"),
          t => length(t) > 0))).cast("binary")).as("_bow"))
      .groupBy("_bow").agg(min("_id").as(idCol))
      .drop("_bow")
    docs.join(keep, Seq(idCol), "left_semi")
  }

  /** The curated corpus: filtered, scrubbed, exact- (optionally
    * bag-of-words-) and near-deduped, decontaminated. Output columns =
    * input columns with `textCol` replaced by its PII-scrubbed text. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      benchmark: Option[DataFrame] = None,
      rules: Rules = Rules()): DataFrame = {
    val filtered = docs.where(passesFilters(col(textCol), rules))
      .withColumn(textCol, TextFunctions.redactPii(col(textCol)))
    val exact0 = Dedup.dropExactDups(filtered, idCol, textCol)
    val exact =
      if (rules.bowDedup) dropBowDups(exact0, idCol, textCol) else exact0
    val near = Dedup.dropNearDups(exact, idCol, textCol,
      rules.nearDupThreshold)
    benchmark match {
      case None => near
      case Some(b) =>
        val contaminated = DataPrep.contaminationFlags(near, b, idCol,
          textCol, minOverlap = rules.decontaminateMinOverlap)
          .select(idCol)
        near.join(contaminated, Seq(idCol), "left_anti")
    }
  }

  /** C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…", §2.2): the published heuristics that
    * turned Common Crawl into C4, applied to newline-delimited page text.
    *
    * Line rules (a line survives iff ALL hold):
    *   - ends in a terminal punctuation mark (. ! ? or closing quote);
    *   - contains at least `minWordsPerLine` words (paper: 3);
    *   - does not contain the word "javascript" (case-insensitive).
    * Page rules (the page survives iff ALL hold):
    *   - at least `minLinesPerPage` surviving lines (paper: 5 sentences);
    *   - no "lorem ipsum" anywhere (case-insensitive);
    *   - no curly bracket anywhere.
    * (The paper's fourth page rule — a bad-words blocklist — is the
    * caller's `pageBlockPhrases`; the default carries only the paper's
    * own phrases — "lorem ipsum" plus BOTH braces, so "no curly bracket
    * anywhere" holds for '}' too — no external word list ships with the
    * library.)
    *
    * Scale shape: one narrow per-row pass of codegen HOFs (split /
    * filter / array_join) — no shuffle, no UDF; at 100 TB this is
    * scan-bound. Beyond-reference operator (the reference's cleaning
    * stage is telemetry sentinels); slots before [[curate]]'s filters. */
  def c4LineClean(docs: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3, minLinesPerPage: Int = 5,
      pageBlockPhrases: Seq[String] = Seq("lorem ipsum", "{", "}"))
      : DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(filter(split(trim(l), "\\s+"), w => length(w) > 0))
          >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val pageOk = pageBlockPhrases
      .map(p => !lower(col(textCol)).contains(p.toLowerCase))
      .foldLeft(size(kept) >= minLinesPerPage)(_ && _)
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept_lines"),
      pageOk.as("page_kept"),
      when(pageOk, array_join(kept, "\n")).otherwise(lit(""))
        .as("cleaned_text"))
  }

  /** Per-stage survivor counts — 4 actions over progressively smaller
    * frames; run it when the funnel numbers matter, not on every call. */
  def report(docs: DataFrame, idCol: String, textCol: String,
      benchmark: Option[DataFrame] = None,
      rules: Rules = Rules()): Map[String, Long] = {
    val filtered = docs.where(passesFilters(col(textCol), rules))
      .withColumn(textCol, TextFunctions.redactPii(col(textCol)))
    val exact0 = Dedup.dropExactDups(filtered, idCol, textCol)
    val exact =
      if (rules.bowDedup) dropBowDups(exact0, idCol, textCol) else exact0
    val near = Dedup.dropNearDups(exact, idCol, textCol,
      rules.nearDupThreshold)
    val curated = benchmark match {
      case None => near
      case Some(b) =>
        near.join(DataPrep.contaminationFlags(near, b, idCol, textCol,
            minOverlap = rules.decontaminateMinOverlap).select(idCol),
          Seq(idCol), "left_anti")
    }
    Map(
      "input" -> docs.count(),
      "after_filters" -> filtered.count(),
      "after_exact_dedup" -> exact.count(),
      "after_near_dedup" -> near.count(),
      "curated" -> curated.count())
  }
}
