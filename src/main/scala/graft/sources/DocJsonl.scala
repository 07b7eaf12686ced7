package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus source/sink — the de-facto interchange format of
  * LLM training corpora (one document object per line; the layout
  * published web-corpus releases and tokenizer pipelines consume).
  *
  * Scale notes: an explicit schema is mandatory — schemaless
  * `spark.read.json` runs a whole extra inference pass over 100 TB
  * before the real one. Reads are line-splittable (plain or gzip
  * per-file), so parallelism follows file count × block size like any
  * text source. Malformed lines land in `_corrupt_record` (PERMISSIVE)
  * instead of failing the job; [[readValidated]] splits them out so a
  * bad shard quarantines rather than poisons.
  */
object DocJsonl {

  /** The canonical document schema (doc_id, text, lang, source, meta). */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("meta", MapType(StringType, StringType)),
    StructField("_corrupt_record", StringType)))

  /** Read a JSONL corpus directory with the fixed schema. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Read and split (good, quarantined): a record is quarantined when it
    * failed to parse OR misses the required identity/content fields.
    *
    * Deliberately NOT cached: each returned frame is a narrow filter over
    * a splittable source, so materializing both costs two cheap scans —
    * while a `.cache()` here would pin a corpus-sized block set for the
    * whole session (the repo's persist convention is vocab-sized frames
    * only). */
  def readValidated(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    val raw = read(spark, path)
    val bad = raw.where(col("_corrupt_record").isNotNull ||
      col("doc_id").isNull || col("text").isNull)
    val good = raw.where(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop("_corrupt_record")
    (good, bad)
  }

  /** Write a corpus as JSONL, one directory of part files, optionally
    * gzip'd (line-splittable readers downstream want zstd/gzip per file,
    * not a monolith). `partitionBy` a low-cardinality column (e.g.
    * source) for pruned re-reads. */
  def write(docs: DataFrame, path: String,
      partitionCols: Seq[String] = Nil, gzip: Boolean = false): Unit = {
    val writer0 = docs.write.mode("overwrite")
    val writer =
      if (gzip) writer0.option("compression", "gzip") else writer0
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).json(path)
  }
}
