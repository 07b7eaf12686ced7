package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy self-join (record linkage / typo-duplicate detection):
  * candidate pairs share a cheap equi block key — the lowercased first
  * `blockPrefix` characters — and survivors are verified with exact
  * Levenshtein distance ≤ `maxDist`. The edit-distance rendering of the
  * repo's blocked-similarity family: MinHash bands (Jaccard), simhash
  * chunks (Hamming), and here prefix blocks (Levenshtein).
  *
  * Scale shape: one narrow key projection per side, a keyed equi join on
  * the block (block-local quadratic, like q_jaccard_pairs — bounded by
  * the largest block, never corpus²), a free length-difference
  * pre-filter (|len a − len b| ≤ maxDist is a necessary condition, so it
  * prunes before the O(n·m) distance), then the exact verify.
  *
  * Recall contract (the standard blocking trade, stated rather than
  * hidden): a true pair whose edit lies inside the first `blockPrefix`
  * characters lands in different blocks and is MISSED — same contract as
  * LSH banding. Callers needing first-position robustness block on a
  * second key (e.g. suffix) and union, exactly like adding bands.
  */
object FuzzyJoin {

  /** Distinct unordered candidate pairs (id_a < id_b) with their exact
    * distance. */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 2, blockPrefix: Int = 4): DataFrame = {
    def side(tag: String) =
      df.select(col(idCol).as(s"id_$tag"),
        col(strCol).as(s"s_$tag"),
        lower(substring(col(strCol), 1, blockPrefix)).as("blk"),
        length(col(strCol)).as(s"len_$tag"))
    // the O(n·m) distance is computed ONCE after the cheap id/length
    // pruning and the filter reads that column — a levenshtein call in
    // both the join filter and the projection sits in separate operators
    // where codegen cannot share the work.
    side("a").join(side("b"),
        Seq("blk"))
      .where(col("id_a") < col("id_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
