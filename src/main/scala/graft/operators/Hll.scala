package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), built
  * declaratively so the ENTIRE sketch — bucketing, rank extraction,
  * register max-merge, harmonic-mean estimator, linear-counting fallback —
  * replays in portable SQL and the estimate is oracle-checkable
  * bit-for-bit (no other engine's approx_count_distinct can be compared
  * against: implementations differ; this one is pinned by construction).
  * Completes the sketch family next to Misra-Gries ([[HeavyHitters]]).
  *
  * Layout: p = 12 → m = 4096 registers (σ ≈ 1.04/√m ≈ 1.6%). The hash is
  * [[Hashing.md5Long56]] (56 non-negative bits, exact DuckDB twin): top
  * 12 bits route to a bucket, the low 44 form the rank suffix. All
  * register math stays in exact integers — the per-bucket contribution
  * 2^(−ρ) is carried scaled by 2^45 (so a register's weight is
  * 2^bitlen(suffix), bitlen(0) = 0, and an EMPTY bucket weighs 2^45),
  * making the harmonic-sum denominator an exact BIGINT (≤ 4096·2^45 =
  * 2^57) that commutes under any agg order. Only the final constant ×
  * integer ÷ integer runs in floats — an identical expression tree on
  * identical exact inputs, hence identical IEEE doubles cross-engine.
  *
  * Scale shape: one narrow hash projection → two-phase agg onto ≤ 4096
  * bucket keys (map-side combine reduces every task to ≤ 4096 rows
  * before the shuffle) → 1-row final agg. The register frame is also the
  * MERGE surface: sketches of corpus shards union and re-aggregate with
  * `min(min_len)` — max-ρ merge in the scaled representation — without
  * touching row data again.
  */
object Hll {
  val P = 12
  val M: Int = 1 << P // 4096
  // 56-bit hash = P bucket bits + 44 suffix bits; ρ ∈ [1, 45]
  private val RemMod = 1L << (56 - P)
  /** α·m²·2^45 computed once (0.7213/(1 + 1.079/m)·m²·2^45) and written
    * as ONE double literal so Scala and SQL share the exact bits rather
    * than each folding its own constant expression. */
  val AlphaScaled = 4.2566823519294213e20

  /** Per-bucket registers: (bucket, min_len) where min_len =
    * min bitlen(suffix) over the bucket's rows — the scaled form of the
    * classic max-ρ register (ρ = 45 − bitlen, so min bitlen ⇔ max ρ). */
  def registers(df: DataFrame, key: Column): DataFrame =
    registersBy(df, Nil, key)

  /** Keyed registers: one 4096-register sketch per group — the
    * per-domain / per-source cardinality report a 100 TB corpus needs
    * (distinct tokens per source, distinct users per event type) at a
    * bounded |groups|·4096-row state instead of a count(DISTINCT) whose
    * shuffle carries every distinct key. Same two-phase agg shape as
    * the global sketch: map-side combine reduces every task to
    * ≤ |groups|·4096 rows before the exchange. */
  def registersBy(df: DataFrame, groupCols: Seq[String],
      key: Column): DataFrame =
    bucketLens(df, groupCols, key)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(min("_len").as("min_len"))

  /** The per-row hash → bucket → scaled-rank projection every register
    * aggregation builds on — (groupCols..., bucket, _len). ONE source
    * for the md5-56 split and the P/RemMod constants, so a sketch
    * layout change cannot desynchronize a consumer that aggregates
    * the projection differently (EvalMetrics.gramRegisters carries
    * bucket counts beside the min-rank registers). */
  private[graft] def bucketLens(df: DataFrame, groupCols: Seq[String],
      key: Column): DataFrame =
    df.select(groupCols.map(col) :+
        Hashing.md5Long56(key.cast("string")).as("_h"): _*)
      .select(groupCols.map(col) ++ Seq(
        expr(s"_h DIV $RemMod").as("bucket"),
        expr(s"_h % $RemMod").as("_rem")): _*)
      .select(groupCols.map(col) ++ Seq(col("bucket"),
        when(col("_rem") === 0, 0L)
          .otherwise(length(bin(col("_rem"))).cast("long"))
          .as("_len")): _*)

  /** One estimate row per group from keyed registers — the group-level
    * twin of [[estimateFromRegisters]] (identical estimator expression,
    * grouped). Also the shard-merge surface: union keyed register
    * frames, re-aggregate `min(min_len)` per (group, bucket), estimate. */
  def estimateByGroups(df: DataFrame, groupCols: Seq[String],
      key: Column): DataFrame = {
    require(groupCols.nonEmpty, "use estimate() for the global sketch")
    estimateFromRegistersBy(registersBy(df, groupCols, key), groupCols)
  }

  /** One-row estimate frame: (n_present, s_scaled, est_raw_q, est_q) —
    * the exact integer register summary plus the floor-quantized raw and
    * final (linear-counting-corrected) estimates. */
  def estimate(df: DataFrame, key: Column): DataFrame =
    estimateFromRegisters(registers(df, key))

  /** Estimate from ANY register frame — a batch sketch, a merged union
    * of shard sketches, or a snapshot of
    * [[graft.streaming.StreamingHll]]'s continuously-maintained state. */
  def estimateFromRegisters(regs: DataFrame): DataFrame =
    estimateFromRegistersBy(regs, Nil)

  /** THE estimator — one implementation for the global and grouped
    * paths (groupCols = Nil ⇒ global), so the bit-exact expression tree
    * both SQL oracles replay has exactly one source (the
    * registers/registersBy discipline; r11 review). */
  def estimateFromRegistersBy(regs: DataFrame,
      groupCols: Seq[String]): DataFrame = {
    val s = sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(min_len AS INT))"))
      .cast("long")
    regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_present"), s.as("_s_present"))
      .select(groupCols.map(col) ++ Seq(col("n_present"),
        (col("_s_present") + (lit(M.toLong) - col("n_present"))
          * lit(1L << 45)).as("s_scaled")): _*)
      .withColumn("_raw",
        lit(AlphaScaled) / col("s_scaled").cast("double"))
      .withColumn("_zeros", lit(M.toLong) - col("n_present"))
      .select(groupCols.map(col) ++ Seq(col("n_present"), col("s_scaled"),
        floor(col("_raw")).cast("long").as("est_raw_q"),
        floor(when(col("_raw") <= lit(2.5 * M) && col("_zeros") > 0,
            lit(M.toDouble) *
              log(lit(M.toDouble) / col("_zeros").cast("double")))
          .otherwise(col("_raw"))).cast("long").as("est_q")): _*)
  }
}
