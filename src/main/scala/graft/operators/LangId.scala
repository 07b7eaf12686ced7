package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Trained language identification by character-trigram rank profiles
  * (Cavnar & Trenkle 1994, "N-Gram-Based Text Categorization") — the
  * classifier rung above the stopword-list heuristic in
  * `TextFunctions.langId`: build a per-language profile of the top-N
  * trigrams (ranked by frequency) from a labeled training split, then
  * classify each document by the out-of-place distance between its own
  * top-N trigram ranking and each language profile.
  *
  * Reference scope: no LID exists in the reference; beyond-parity
  * LLM-pipeline family (every web-corpus curation funnel gates on
  * language before quality filtering).
  *
  * Determinism: ranks are `row_number` over (count DESC, trigram ASC)
  * — total order, no ties — and the distance is an exact integer sum
  * of |rank_doc − rank_lang| with a fixed miss penalty of N, so the
  * DuckDB oracle replays the whole classifier bit-for-bit.
  *
  * Scale shape: one corpus-sized shuffle keyed by (doc, trigram) for
  * the per-doc counts and a doc-keyed window for the per-doc top-N —
  * after that every frame is bounded: the language profiles are
  * |langs|·N rows (broadcast), the scoring grid is N·|langs| rows per
  * document (top-N trigrams cross-joined with the broadcast language
  * list, left-joined against the broadcast profiles), and the argmin
  * is a doc-keyed aggregation. Document text never shuffles; nothing
  * grows with corpus size except the two doc-keyed exchanges.
  */
object LangId {

  /** Classify every document. `trainFilter` selects the labeled
    * training split (rows whose `langCol` is trusted); all docs —
    * including training docs — are scored. Returns
    * (idCol, pred_lang, dist) with dist the integer out-of-place
    * distance of the winning language (ties broken by language name).
    * Documents shorter than 3 chars after lower+trim are dropped. */
  def rankProfileLid(docs: DataFrame, idCol: String, textCol: String,
      langCol: String, trainFilter: Column, topN: Int = 20): DataFrame = {
    require(topN >= 1 && topN <= 1000)
    val tris = docs
      .select(col(idCol), col(langCol).as("_lang"),
        lower(trim(col(textCol))).as("_t"), trainFilter.as("_train"))
      .where(length(col("_t")) >= 3)
      .select(col(idCol), col("_lang"), col("_train"),
        explode(transform(sequence(lit(1), length(col("_t")) - 2),
          p => col("_t").substr(p, lit(3)))).as("tri"))

    val docProf = tris.groupBy(col(idCol), col("tri")).count()
      .withColumn("r_doc", row_number().over(
        Window.partitionBy(idCol).orderBy(col("count").desc, col("tri"))))
      .where(col("r_doc") <= topN)
      .drop("count")

    val langProf = tris.where(col("_train"))
      .groupBy(col("_lang"), col("tri")).count()
      .withColumn("r_lang", row_number().over(
        Window.partitionBy("_lang").orderBy(col("count").desc, col("tri"))))
      .where(col("r_lang") <= topN)
      .drop("count")

    val langs = langProf.select(col("_lang")).distinct()

    val scored = docProf
      .crossJoin(broadcast(langs))
      .join(broadcast(langProf), Seq("_lang", "tri"), "left")
      .groupBy(col(idCol), col("_lang"))
      .agg(sum(coalesce(abs(col("r_doc") - col("r_lang")),
        lit(topN.toLong))).as("dist"))

    scored
      .withColumn("_rk", row_number().over(
        Window.partitionBy(idCol).orderBy(col("dist"), col("_lang"))))
      .where(col("_rk") === 1)
      .select(col(idCol), col("_lang").as("pred_lang"),
        col("dist").cast("long").as("dist"))
  }
}
