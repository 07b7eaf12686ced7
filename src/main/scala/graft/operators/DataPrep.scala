package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Training-data preparation operators (beyond-parity LLM-pipeline set):
  * shard packing by token budget, deterministic content-hash splits, and
  * benchmark decontamination. Each is a declarative single-plan operator —
  * window running sums, hash prefixes, and keyed joins — so Catalyst keeps
  * the usual scale properties (partial aggregation, broadcast of the small
  * side, no driver loops).
  */
object DataPrep {

  /** Pack documents into shards by cumulative token budget, sequentially
    * within each `partCol` group (the "fill shards in corpus order"
    * pattern): shard_id = floor(exclusive-prefix-sum(tokens) / budget).
    * A document that straddles a boundary belongs to the shard its first
    * token falls in. One shuffle on `partCol`; the running sum is exact
    * integer arithmetic.
    *
    * At 100 TB the per-group sequential constraint is the point: packing
    * is only order-dependent WITHIN a shard group (source, dump, epoch),
    * and groups pack in parallel. */
  def shardByTokenBudget(docs: DataFrame, idCol: String, partCol: String,
      tokensCol: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("tokens", tokensCol)
      .withColumn("_cum", sum("tokens").over(w))
      .withColumn("shard_id",
        floor((col("_cum") - col("tokens")) / lit(budget.toDouble)))
      .drop("_cum")
  }

  /** Deterministic train/val/test split on a content-derived sha256
    * prefix: stable across engines, machines, and runs; no RNG state to
    * ship. `bounds` are 2-hex-digit upper bounds per named split, checked
    * in order (e.g. ("train", "cc"), ("val", "e6") → train ≈ 80%,
    * val ≈ 10%, remainder = last split). Lexicographic compare of the
    * lowercase hex prefix is engine-portable (q_hash_id pins sha256
    * parity with the oracle). */
  def hashSplit(df: DataFrame, idCol: String,
      bounds: Seq[(String, String)], rest: String,
      salt: String = "split|"): DataFrame = {
    val h = substring(
      sha2(concat(lit(salt), col(idCol).cast("string")), 256), 1, 2)
    val split = bounds.foldRight(lit(rest)) { case ((name, bound), acc) =>
      when(h < bound, name).otherwise(acc)
    }
    df.withColumn("split", split)
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minOverlap` distinct word n-grams with any benchmark document.
    * The benchmark gram set is tiny → broadcast; the corpus side explodes
    * its grams once and joins on the gram key (never doc × doc).
    * Returns (idCol, n_overlap) for flagged documents. */
  def contaminationFlags(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      minOverlap: Long = 2): DataFrame = {
    val corpusGrams = corpus.select(col(idCol),
        explode(TextFunctions.wordShingles(col(textCol), n)).as("gram"))
    val benchGrams = benchmark
      .select(explode(TextFunctions.wordShingles(col(textCol), n))
        .as("gram"))
      .distinct()
    corpusGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(countDistinct(col("gram")).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }
}
