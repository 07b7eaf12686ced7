package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Count-Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications"), built
  * declaratively so the ENTIRE sketch — depth-salted hashing, register
  * sums, the min-over-depths point query — replays in portable SQL and
  * every estimate is oracle-checkable bit-for-bit (all register math is
  * exact integers; there are no floats anywhere). Completes the sketch
  * family beside Misra-Gries ([[HeavyHitters]], exact-frequent-items)
  * and HyperLogLog ([[Hll]], distinct counts): CMS answers per-key
  * frequency estimates with one-sided error (est ≥ true count always;
  * overshoot ≤ e·n/W with probability 1 − e^−D).
  *
  * Layout: D = 4 hash rows × W = 1024 buckets = 4096 registers — the
  * same footprint as [[Hll]]'s register file. The D hash functions are
  * [[Hashing.md5Long56]] over a depth-salted key (`"<d>|" + key`), each
  * reduced mod W; salting one portable hash is the standard universal-
  * family construction and keeps the build inside whole-stage codegen.
  *
  * Scale shape: one narrow key projection → a D-way in-row explode →
  * two-phase agg onto ≤ D·W register keys (map-side combine reduces
  * every task to ≤ 4096 rows before the one shuffle) — the corpus never
  * shuffles. The register frame is also the MERGE surface: shard
  * sketches union and re-sum per (depth, bucket) without touching row
  * data again, which is what makes the sketch maintainable across 100 TB
  * of partitioned input or a stream checkpoint.
  */
object Cms {
  val D = 4
  val W = 1024

  /** The D depth-salted bucket addresses of one key, as an array of
    * (depth, bucket) structs — shared by the build and the probe side so
    * the two can never disagree on addressing. */
  private def addresses(key: Column): Column =
    transform(sequence(lit(0), lit(D - 1)),
      i => struct(i.as("depth"),
        (Hashing.md5Long56(concat(i.cast("string"), lit("|"), key))
          % W).as("bucket")))

  /** Register frame (depth, bucket, n) of unit increments — one count
    * per input row per depth. ≤ D·W rows out. */
  def registers(df: DataFrame, key: Column): DataFrame =
    registersWeighted(df.select(key.cast("string").as("_k")),
      col("_k"), lit(1L))

  /** Register frame from pre-aggregated (key, weight) rows — e.g. a
    * word-frequency table. Identical to [[registers]] over the raw
    * corpus when `weight` is the key's corpus count (CmsSpec pins the
    * equivalence), but costs a vocab-sized job instead of a corpus pass
    * when the counts already exist. */
  def registersWeighted(df: DataFrame, key: Column,
      weight: Column): DataFrame =
    df.select(weight.cast("long").as("_w"),
        explode(addresses(key.cast("string"))).as("p"))
      .groupBy(col("p.depth").as("depth"), col("p.bucket").as("bucket"))
      .agg(sum("_w").as("n"))

  /** Merge shard sketches: counts add per register. The result is the
    * register frame of the concatenated inputs, exactly. */
  def merged(shards: Seq[DataFrame]): DataFrame =
    shards.reduce(_.unionByName(_))
      .groupBy("depth", "bucket").agg(sum("n").as("n"))

  /** Point estimates for the keys of `keys(keyCol)`: est(k) = min over
    * depths of the addressed register, absent registers reading 0.
    * The register frame is ≤ D·W rows → broadcast, so the probe side
    * pays one in-row explode and a vocab-sized groupBy, no corpus-scale
    * shuffle. Output: (keyCol, est_n), with est_n ≥ the true count of
    * `k` in the sketched input — the CMS one-sided guarantee. */
  def estimates(regs: DataFrame, keys: DataFrame,
      keyCol: String): DataFrame =
    keys.select(col(keyCol).cast("string").as(keyCol))
      .select(col(keyCol), explode(addresses(col(keyCol))).as("p"))
      .select(col(keyCol), col("p.depth").as("depth"),
        col("p.bucket").as("bucket"))
      .join(broadcast(regs), Seq("depth", "bucket"), "left")
      .groupBy(keyCol)
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
}
