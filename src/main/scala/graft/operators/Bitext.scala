package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Artetxe & Schwenk 2019, "Margin-based
  * Parallel Corpus Mining with Multilingual Sentence Embeddings" — the
  * LASER/CCMatrix recipe): given two corpora embedded in a SHARED space,
  * a pair (x, y) is parallel when its similarity stands out from each
  * side's local neighborhood — raw cosine alone cannot separate
  * translations from hubs (vectors that are everyone's neighbor), so the
  * score is the RATIO margin
  *
  *   margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
  *
  * where avgNN_k is the mean cosine of the k nearest cross-corpus
  * neighbors. This is the data-sourcing operator behind the public
  * mined-bitext corpora (CCMatrix/CCAligned-class pipelines).
  *
  * Engine-exact discipline: cosines quantize to cq = floor(cos·10⁶)
  * BEFORE any aggregation, so neighborhood sums are exact integers and
  * the margin is ONE integer division both engines compute identically:
  *
  *   margin_q = (cq · 2 · nA · nB · 10⁶) div (SA·nB + SB·nA)
  *
  * (the cross-multiplied form of the ratio above with the two means
  * SA/nA, SB/nB; nA/nB are the actual neighborhood sizes, ≤ k, so thin
  * corpora don't divide by a phantom k). Long bound: cq ≤ 10⁶ and
  * nA·nB ≤ k², so the numerator is ≤ 2·10¹²·k² — safe to k ≈ 2000.
  *
  * Only positively-similar candidates (cq > 0) participate: a negative
  * cosine is never a translation candidate, and the filter keeps every
  * neighborhood sum strictly positive so the integer division is
  * floor == truncation on both engines.
  *
  * Scale shape: the candidate pair set is the only corpus-sized
  * intermediate. `bits = None` scores A × broadcast(B) — the exact
  * baseline (B is the smaller/benchmark side by convention). At 100 TB
  * use `bits = Some(b)`: both sides compute ONE `b·bands`-bit
  * random-hyperplane signature ([[SimilaritySearch.lshSignaturePortable]])
  * sliced into `bands` independent b-bit tables, and a pair becomes a
  * candidate when ANY band matches (the MinHash-banding OR-amplification:
  * a single table loses pairs at rate 1−p^b, banding at (1−p^b)^bands —
  * a planted near-identical pair that flips one hyperplane in one band
  * still collides in another). Keyed band joins, never all-pairs;
  * multi-band collisions dedup on the pair key before scoring.
  * Everything after candidate scoring is candidate-sized: two
  * partitioned rank windows, two keyed stat joins, one final per-src
  * argmax window.
  */
object Bitext {

  /** [[mine]] with the banded-candidate grid (bits, bands) chosen by
    * [[SimilaritySearch.hyperplanePlanFor]] from the REAL corpus sizes
    * (two count actions at plan-construction time) and a recall
    * budget: pairs at `targetCosine` are caught with probability ≥
    * `minCatch`, and the grid scales with the corpora instead of
    * flooding at 10× (the fixed-64-bucket lesson of SCALING.md r11).
    * Throws when no grid inside the 64-bit signature meets the budget
    * — a flooding grid must be an explicit caller decision via
    * [[mine]], never a planner default. */
  def minePlanned(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, k: Int, minMargin: Double,
      mutual: Boolean = false, targetCosine: Double = 0.99,
      minCatch: Double = 0.95,
      maxCandidatesPerRow: Double = 1024.0): DataFrame = {
    val nA = a.count()
    val nB = b.count()
    val (bits, bands) = SimilaritySearch.hyperplanePlanFor(
      targetCosine, nA, nB, minCatch,
      maxCandidatesPerRow = maxCandidatesPerRow)
      .getOrElse(throw new IllegalArgumentException(
        s"no (bits, bands) grid inside the 64-bit signature catches " +
          s"cosine-$targetCosine pairs at >= $minCatch under " +
          s"$maxCandidatesPerRow candidates/row for corpus sizes " +
          s"($nA, $nB) — widen the signature or relax the budget"))
    mine(a, b, idCol, vecCol, k, minMargin, mutual, Some(bits), bands)
  }

  /** Mine forward pairs: for every source vector, its best-margin target
    * with margin ≥ `minMargin`; `mutual = true` additionally requires the
    * pair to be the target's best margin too (the paper's intersection
    * strategy — higher precision, drops hub-contested pairs).
    *
    * @param a source corpus (idCol, vecCol)
    * @param b target corpus (idCol, vecCol) — broadcast when bits = None
    * @param k neighborhood size for the margin denominator
    * @return (src_id, tgt_id, cosine, margin) — margin as a 6-decimal
    *         double reconstructed from the exact integer margin_q
    */
  def mine(a: DataFrame, b: DataFrame, idCol: String, vecCol: String,
      k: Int, minMargin: Double, mutual: Boolean = false,
      bits: Option[Int] = None, bands: Int = 4): DataFrame = {
    require(k >= 1 && k <= 2000, s"neighborhood k=$k outside [1, 2000]")
    bits.foreach(nb => require(nb >= 1 && bands >= 1 && nb * bands <= 64,
      s"bits=$nb x bands=$bands exceeds the 64-bit signature"))
    graft.plans.GraftExtensions.register(a.sparkSession)
    val src = a.select(col(idCol).as("src_id"),
      col(vecCol).cast("array<double>").as("va"))
    val tgt = b.select(col(idCol).as("tgt_id"),
      col(vecCol).cast("array<double>").as("vb"))

    val candidates = bits match {
      case Some(nb) =>
        // one wide signature sliced into `bands` b-bit tables; the band
        // index rides the join key so bands stay independent. nb = 64
        // needs the explicit all-ones mask: (1L << 64) wraps to 1L
        // (shift counts are mod 64), which would silently collapse
        // every bucket to 0 — an all-pairs join on one shuffle key
        val mask = if (nb == 64) -1L else (1L << nb) - 1L
        def banded(df: DataFrame, vc: String) = df
          .withColumn("sig",
            SimilaritySearch.lshSignaturePortable(col(vc), nb * bands))
          .withColumn("band", explode(lit((0 until bands).toArray)))
          .withColumn("bucket",
            expr(s"shiftright(sig, band * $nb) & ${mask}L"))
          .drop("sig")
        banded(src, "va").join(banded(tgt, "vb"), Seq("band", "bucket"))
          .drop("band", "bucket")
          .dropDuplicates("src_id", "tgt_id")
      case None => src.crossJoin(broadcast(tgt))
    }
    val scored = candidates
      .withColumn("cq",
        floor(SimilaritySearch.cosine(col("va"), col("vb")) * lit(1e6))
          .cast("long"))
      .where(col("cq") > 0)
      .select("src_id", "tgt_id", "cq")

    // per-side neighborhood stats over the SAME candidate set: exact
    // integer sum of the top-k quantized cosines + actual count
    def nnStats(keyCol: String, sumName: String, nName: String) = {
      val w = Window.partitionBy(keyCol)
        .orderBy(col("cq").desc,
          col(if (keyCol == "src_id") "tgt_id" else "src_id"))
      scored.withColumn("r", row_number().over(w))
        .where(col("r") <= k)
        .groupBy(keyCol)
        .agg(sum("cq").as(sumName), count(lit(1)).as(nName))
    }
    val statsA = nnStats("src_id", "sa", "na")
    val statsB = nnStats("tgt_id", "sb", "nb")

    val margined = scored
      .join(statsA, Seq("src_id"))
      .join(statsB, Seq("tgt_id"))
      .withColumn("margin_q",
        expr("(cq * 2 * na * nb * 1000000L) div (sa * nb + sb * na)"))
    val wFwd = Window.partitionBy("src_id")
      .orderBy(col("margin_q").desc, col("tgt_id"))
    // mutual rank is computed over ALL of the target's candidates (the
    // paper's intersection strategy), not just forward winners — a hub
    // target that is some other source's better match must disqualify
    // the pair even when that other source ranks elsewhere forward
    val wBwd = Window.partitionBy("tgt_id")
      .orderBy(col("margin_q").desc, col("src_id"))
    val ranked =
      if (mutual) margined.withColumn("r_fwd", row_number().over(wFwd))
        .withColumn("r_bwd", row_number().over(wBwd))
        .where(col("r_bwd") === 1)
      else margined.withColumn("r_fwd", row_number().over(wFwd))
    val picked = ranked
      .where(col("r_fwd") === 1 &&
        col("margin_q") >= lit(math.floor(minMargin * 1e6).toLong))
    picked.select(col("src_id"), col("tgt_id"),
      (col("cq").cast("double") / 1e6).as("cosine"),
      (col("margin_q").cast("double") / 1e6).as("margin"))
  }
}
