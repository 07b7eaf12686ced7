package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/** Bloom filter (Bloom 1970) as a DECLARATIVE bit table — (word_idx,
  * word) rows of a packed bit array — rather than a driver-side opaque
  * object (which the incremental-append path already has via
  * `DataFrame.stat.bloomFilter`, see
  * [[TelemetryTransform.appendNewWithBloom]]). Making the filter a
  * DataFrame buys what the opaque object can't do: it persists as a
  * table next to the data it summarizes, shard filters MERGE by
  * `bit_or` without re-reading rows, and — because addressing uses the
  * depth-salted [[Hashing.md5Long56]] discipline of [[Cms]]/[[Hll]] —
  * the ENTIRE build and probe replay in portable SQL, so membership
  * answers are oracle-checkable bit-for-bit.
  *
  * Packing: `mBits` bits in 32-bit words carried as longs (a 63-bit
  * shift would go negative in a signed long and engines disagree on
  * wrap semantics; bit 31 of a long stays positive everywhere).
  * K hash functions = K depth salts over one portable hash, the
  * standard universal-family construction.
  *
  * Scale shape mirrors the sketch family: build is one narrow key
  * projection → K-way in-row explode → two-phase agg onto ≤ mBits/32
  * word keys (map-side combine collapses every task to the word table
  * before the one shuffle); the corpus never shuffles. Probe joins the
  * ≤ mBits/32-row filter broadcast against the probe keys' addresses —
  * no shuffle beyond the probe's own keyed agg. Guarantees: a key that
  * was inserted ALWAYS probes true (no false negatives — BloomSpec
  * pins it); a non-member probes true with p ≈ (1 − e^(−K·n/m))^K.
  */
object Bloom {
  val K = 4
  val MBits = 65536 // 2048 32-bit words; ~1% fpp at n ≈ 8k keys

  /** The bit address of one (depth, key) pair — ONE shared helper for
    * build and probe so the two can never disagree on addressing.
    *
    * Deliberately a FLAT column over an already-exploded depth, not a
    * `transform(sequence(...))` array: higher-order-function lambdas are
    * evaluated interpreted (no whole-stage codegen, no common-
    * subexpression elimination), so the md5 inside [[Hashing.md5Long56]]
    * — whose hex-to-long rebuild references it 7 times — would run ~14×
    * per address. In a codegen'd Project, CSE collapses it to one
    * evaluation (measured 5× on the q_bloom build+probe). */
  private def bitAddress(depth: Column, key: Column, mBits: Int): Column =
    Hashing.md5Long56(concat(depth.cast("string"), lit("|"), key)) % mBits

  /** (word_idx, _mask) rows: K per input row, one per depth salt.
    * shiftright, not `/`: Column division is DOUBLE division. */
  private def addresses(df: DataFrame, key: Column, k: Int,
      mBits: Int, carry: Seq[Column]): DataFrame =
    // K-way explode + md5 per address multiplies per-row work; a small
    // single-split scan (one task) would serialize all of it, so spread
    // the pre-explode rows first (no-op when the scan already has
    // >= defaultParallelism splits, the cluster case)
    graft.Tables.ensureParallelism(df)
      .select(carry :+ key.cast("string").as("_key") :+
        explode(sequence(lit(0), lit(k - 1))).as("_d"): _*)
      .withColumn("_bit", bitAddress(col("_d"), col("_key"), mBits))
      .select(carry :+ shiftright(col("_bit"), 5).as("word_idx") :+
        expr("shiftleft(CAST(1 AS BIGINT), CAST(_bit % 32 AS INT))")
          .as("_mask"): _*)

  /** Build the filter table (word_idx, word) from `df`'s `key` column.
    * Only set words appear; an absent word_idx is an all-zero word.
    * Inserts are idempotent (OR), so the input needs no distinct. */
  def build(df: DataFrame, key: Column, k: Int = K,
      mBits: Int = MBits): DataFrame =
    addresses(df, key, k, mBits, Seq.empty)
      .groupBy("word_idx")
      .agg(bit_or(col("_mask")).as("word"))

  /** Merge shard filters: words OR per index — identical to building
    * one filter over the concatenated inputs. */
  def merged(shards: Seq[DataFrame]): DataFrame =
    shards.reduce(_.unionByName(_))
      .groupBy("word_idx").agg(bit_or(col("word")).as("word"))

  /** Probe: (keyCol, in_bloom) for the keys of `keys(keyCol)`. A key is
    * a member iff ALL K addressed bits are set; a missing word row reads
    * as zero. The filter is ≤ mBits/32 rows → broadcast. Build and probe
    * must share (k, mBits). */
  def mightContain(filter: DataFrame, keys: DataFrame, keyCol: String,
      k: Int = K, mBits: Int = MBits): DataFrame =
    addresses(keys.select(col(keyCol).cast("string").as(keyCol)),
        col(keyCol), k, mBits, Seq(col(keyCol)))
      .join(broadcast(filter), Seq("word_idx"), "left")
      .groupBy(keyCol)
      .agg(bool_and(coalesce(col("word"), lit(0L))
        .bitwiseAND(col("_mask")) =!= 0).as("in_bloom"))
}
