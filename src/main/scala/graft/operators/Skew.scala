package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for the hot-key cases AQE's skew-join split can't fix
  * alone (e.g. one device-date holding 100× the rows — SURVEY §7.4 calls
  * out the reference's 96-partition skew).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default here): it splits oversized *shuffle* partitions. Salting
  * is the explicit fallback for aggregation-style hot keys and for joins
  * where one side must replicate.
  */
object Skew {

  /** Salted equi-join: spreads each hot key of `big` over `saltFactor`
    * sub-keys and replicates `small` once per salt value. Result equals
    * `big.join(small, keys)` exactly; the shuffle of `big` spreads hot
    * keys over `saltFactor` reducers at the cost of `small` × saltFactor.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 8): DataFrame = {
    val salted = big.withColumn("_salt",
      floor(rand(42) * saltFactor).cast("int"))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    // Force the salted SHUFFLE with the replicated side as hash build:
    // this operator exists precisely when `small` is too big to
    // broadcast but far smaller than `big` — without the hint,
    // Catalyst's static size estimate at a small SF happily broadcasts
    // the BIG salted side (BuildLeft), which inverts the design and
    // hides the exchange the salt exists to spread. The hint pins the
    // scale-truthful plan: Exchange(keys, _salt) on `big` — every hot
    // key spread over saltFactor reducers — and a per-partition hash
    // build of the replicated small side.
    salted.join(replicated.hint("shuffle_hash"), keys :+ "_salt")
      .drop("_salt")
  }

  /** Two-phase (salted) aggregation for hot grouping keys with algebraic
    * aggregates: pre-aggregate on (key, salt), then merge per key. For
    * built-in algebraic aggs Spark's partial aggregation already does
    * this; use this form when a hot key's *final* reduction is the
    * bottleneck (e.g. giant collect/distinct states).
    *
    * Example shape (count + sum):
    * {{{
    * Skew.twoPhaseSum(df, Seq("k"), "v", 16)  // == df.groupBy("k").sum("v")
    * }}}
    */
  def twoPhaseSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFactor: Int = 8): DataFrame =
    df.withColumn("_salt", floor(rand(42) * saltFactor).cast("int"))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(valueCol).as("_partial"), count(lit(1)).as("_pc"))
      .groupBy(keys.map(col): _*)
      .agg(sum("_partial").as(s"sum_$valueCol"), sum("_pc").as("count"))
}
