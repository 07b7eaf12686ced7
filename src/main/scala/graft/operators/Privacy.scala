package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators for training-data pipelines —
  * the data-governance step between curation and release: before a
  * corpus (or its per-group statistics) leaves the pipeline, groups
  * keyed by quasi-identifiers that are small enough to single out an
  * individual must be suppressed (k-anonymity, Sweeney 2002) and
  * groups whose sensitive attribute is constant must be flagged
  * (l-diversity, Machanavajjhala 2007).
  *
  * Reference scope: the reference engine has no privacy operator —
  * this is part of the beyond-parity LLM-pipeline family (PII
  * redaction in [[graft.functions.TextFunctions.redactPii]] handles
  * in-text identifiers; these operators handle the GROUP-level
  * re-identification risk that redaction cannot).
  *
  * Scale shape: both operators are ONE keyed agg (or one window) on
  * the quasi-identifier tuple — fixed-width group keys, map-side
  * partial aggregation, no join back against the corpus for the
  * group-stats form. The row-level suppression form is a window count
  * over the same key: one shuffle, bounded per-group state (a count),
  * no skew risk beyond what the grouping itself has (a hot QI group
  * is by definition a LARGE group — the kept path, not a blowup).
  */
object Privacy {

  /** Per-group k-anonymity/l-diversity stats over quasi-identifier
    * columns: group size `n`, distinct-sensitive-value count `l_div`,
    * and the release verdict `kept` (n ≥ k AND l_div ≥ l). The
    * group-level release gate: publish only `kept` groups' stats.
    *
    * One groupBy on the QI tuple; countDistinct rides the same
    * exchange (Spark plans it as a two-phase expand+agg, still one
    * shuffle of fixed-width rows). */
  def kAnonymityStats(df: DataFrame, qiCols: Seq[String],
      sensitiveCol: String, k: Long, l: Long = 1L): DataFrame = {
    require(qiCols.nonEmpty, "kAnonymityStats: no quasi-identifiers")
    require(k >= 1 && l >= 1, s"kAnonymityStats: k=$k l=$l must be >= 1")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitiveCol)).as("l_div"))
      .withColumn("kept", col("n") >= k && col("l_div") >= l)
  }

  /** Row-level suppression: rows in QI groups smaller than k get their
    * quasi-identifier columns NULLed (cell suppression) and
    * `suppressed = true`; rows in groups of size ≥ k pass unchanged.
    * Row count is preserved — suppression hides the identifying cells,
    * it does not drop the training text. */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Long)
      : DataFrame = {
    require(qiCols.nonEmpty, "kAnonymize: no quasi-identifiers")
    require(k >= 1, s"kAnonymize: k=$k must be >= 1")
    // the applyChangelog collision convention: the output column must
    // not silently overwrite caller data, and a QI named 'suppressed'
    // would make the nulling fold read its own flag (r11 advice)
    require(!df.columns.contains("suppressed"),
      "kAnonymize: input already has a 'suppressed' column — rename " +
        "it first; the operator writes its verdict there")
    val w = Window.partitionBy(qiCols.map(col): _*)
    val small = count(lit(1)).over(w) < k
    val out = df.withColumn("suppressed", small)
    qiCols.foldLeft(out) { (acc, c) =>
      acc.withColumn(c,
        when(col("suppressed"), lit(null).cast(df.schema(c).dataType))
          .otherwise(col(c)))
    }
  }
}
