package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al. 2020 §3.1.4; the UL2
  * R-denoiser): mask random token spans with `<extra_id_k>` sentinels
  * and emit (corrupted input, target of sentinel-prefixed spans) — the
  * denoising-objective rendering of a document.
  *
  * DETERMINISTIC BLOCK VARIANT: T5's reference sampler draws spans
  * sequentially and rejects overlaps, which is an inherently serial
  * per-document process. Here token positions partition into fixed
  * 8-token blocks and each block independently draws (mask?, offset,
  * length ≤ 3) from portable md5 of (doc id, block index) — no span can
  * cross a block, so there is NOTHING to reject: every block decides in
  * parallel, the whole transform is one narrow fold per row, and a SQL
  * oracle can replay it relationally (unnest blocks → window-numbered
  * sentinels → ordered string_agg). Corruption rate ≈ maskPct/100 ·
  * E[len]/8 per token, the knob the objective actually cares about;
  * the block grid is the documented deviation from the paper's sampler
  * (same class of trade as the banding in MinHash dedup).
  *
  * Plan shape: ONE `aggregate` HOF fold over the block indices per row
  * (the Hilbert/CDC discipline — state is (fragments, targets, k), a
  * quadratic rebuild via per-block slices of prior output would thrash)
  * — narrow projection, zero shuffles, no UDF.
  *
  * @param maskPct percentage of blocks that carry a masked span
  * @return (idCol, input_text, target_text, n_spans) */
object SpanCorrupt {

  private val B = 8 // block width in tokens

  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      maskPct: Int = 40): DataFrame = {
    require(maskPct >= 0 && maskPct <= 100, s"maskPct=$maskPct")
    val id = col(idCol).cast("string")
    def h(salt: String, b: Column): Column =
      graft.functions.Hashing.md5Long56(
        concat(lit(salt), id, lit(":"), b.cast("string")))
    // null → empty token list → ("", "", 0): the fold runs one empty
    // block whose bn = 0 guard disables masking
    val toks = when(col(textCol).isNull, array().cast("array<string>"))
      .otherwise(filter(split(trim(col(textCol)), "\\s+"),
        t => length(t) > 0))
    val nBlocks = greatest(
      ceil(size(toks).cast("double") / B).cast("int"), lit(1))
    // fold state: (input fragments, target fragments, sentinel counter)
    val init = struct(
      array().cast("array<string>").as("frags"),
      array().cast("array<string>").as("tgts"),
      lit(0).as("k"))
    val folded = aggregate(
      sequence(lit(0), nBlocks - 1, lit(1)),
      init,
      (st, b) => {
        val block = slice(toks, b * B + 1, lit(B))
        val bn = size(block)
        val masked = bn > 0 &&
          pmod(h("span|", b), lit(100L)) < lit(maskPct.toLong)
        // Spark HOF lambdas can't bind intermediate names; off/len are
        // written once and reused via these vals (same expression tree)
        val off = pmod(h("spanO|", b), bn.cast("long")).cast("int")
        val len = least(
          (pmod(h("spanL|", b), lit(3L)) + 1L).cast("int"), bn - off)
        val sentinel = concat(lit("<extra_id_"),
          st.getField("k").cast("string"), lit(">"))
        val maskedFrag = concat_ws(" ",
          concat(slice(block, lit(1), off), array(sentinel),
            slice(block, off + len + lit(1), bn)))
        val span = concat_ws(" ", slice(block, off + lit(1), len))
        val plainFrag = concat_ws(" ", block)
        struct(
          concat(st.getField("frags"),
            array(when(masked, maskedFrag).otherwise(plainFrag)))
            .as("frags"),
          when(masked,
            concat(st.getField("tgts"),
              array(concat(sentinel, lit(" "), span))))
            .otherwise(st.getField("tgts")).as("tgts"),
          (st.getField("k") + when(masked, 1).otherwise(0)).as("k"))
      })
    docs.select(col(idCol),
      array_join(folded.getField("frags"), " ").as("input_text"),
      array_join(folded.getField("tgts"), " ").as("target_text"),
      folded.getField("k").as("n_spans"))
  }
}
