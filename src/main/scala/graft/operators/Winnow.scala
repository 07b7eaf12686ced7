package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): hash every character k-gram of the normalized text, then
  * keep the minimum hash of each sliding window of `w` consecutive gram
  * hashes. The guarantee: any shared substring of length >= w + k - 1
  * between two documents yields at least one shared fingerprint, with a
  * fingerprint density of ~2/(w+1) — a tunable, position-robust sketch for
  * substring-level overlap detection (the gap between whole-document
  * minhash and exact span dedup).
  *
  * Everything is row-local array math inside whole-stage codegen — no
  * shuffle, no UDF. The downstream overlap join (fingerprint → docs
  * sharing it) is a keyed shuffle on 8-byte fingerprints, never text —
  * same discipline as the minhash/simhash/span-dedup family.
  */
object Winnow {

  /** Distinct winnowing fingerprints per document: (idCol, fp). `hashFn`
    * defaults to xxhash64 (fastest); pass [[graft.functions.Hashing
    * .md5Long56]] for the DuckDB-portable hash the oracle twin replays.
    * Documents shorter than one full window (len < k + w - 1 normalized
    * chars) produce no rows — too short to fingerprint at this (k, w). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int,
      hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    // Materialize the gram-hash array in its own projection: the window
    // stage references it twice (length + every slice), and inlining the
    // tree into each lambda would re-hash all n grams per window —
    // O(n²·k) per row instead of O(n·(k+w)). CollapseProject keeps the
    // split because the alias is non-cheap and multiply-referenced.
    df.where(length(norm) >= k + w - 1)
      .select(col(idCol), transform(
        sequence(lit(1), length(norm) - (k - 1)),
        i => hashFn(norm.substr(i, lit(k)))).as("_hs"))
      .select(col(idCol),
        explode(array_distinct(transform(
          sequence(lit(0), size(col("_hs")) - w),
          j => array_min(slice(col("_hs"), j + 1, lit(w)))))).as("fp"))
  }

  /** Document pairs sharing at least `minShared` fingerprints — the
    * overlap-detection join the fingerprints exist for. Keyed self-join on
    * the 8-byte fingerprint with an early distinct; at corpus scale the
    * fingerprint table is ~2/(w+1) of the corpus' k-gram count and the
    * join never carries text. */
  def overlapPairs(fps: DataFrame, idCol: String,
      minShared: Long = 2): DataFrame = {
    val a = fps.select(col(idCol).as("id_a"), col("fp"))
    val b = fps.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
