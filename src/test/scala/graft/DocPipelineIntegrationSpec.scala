package graft

import graft.operators.{CorpusStats, Curation, DataPrep, Dedup, Tokenizer}
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end LLM data-prep pipeline over the real documents table:
  * curate (filters → PII → exact/near dedup) → CCNet perplexity band
  * selection → keep-one exact-substring strip → BPE train / encode /
  * decode round trip → token-budget sequence packing — the whole
  * training-data flow composed through the real interfaces, the doc-side
  * twin of [[PipelineIntegrationSpec]]'s telemetry slice. Every stage is
  * individually oracle- or spec-gated; this pins their COMPOSITION
  * (schemas line up, row accounting holds, the terminal artifacts are
  * consistent with the inputs).
  */
class DocPipelineIntegrationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("curate → band-select → strip → tokenize → pack composes with " +
      "exact row accounting and a lossless round trip") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val nDocs = docs.count()
    assert(nDocs > 0)

    // Stage boundaries use eager localCheckpoint: the composed lineage
    // (curate joins + CC loop + kn5's ten joins + strip windows +
    // encode) otherwise accumulates into one plan tree large enough to
    // OOM Catalyst's plan stringification — and a real pipeline would
    // materialize between stages anyway (the telemetry pipeline's
    // gold-parquet boundary, without the filesystem).

    // 1. curation: survivors are a subset of the input ids
    val curated = Curation.curate(docs, "doc_id", "text")
      .localCheckpoint()
    val nCurated = curated.count()
    assert(nCurated > 0 && nCurated <= nDocs)
    assert(curated.join(docs, Seq("doc_id"), "left_anti").count() == 0)

    // 2. CCNet band selection: bands partition the scorable survivors;
    //    keep head+middle (the CCNet choice)
    val bands = CorpusStats.perplexityBands(curated, "doc_id", "text")
      .localCheckpoint()
    val nScorable = curated
      .where(TextFunctions.tokenCountWs(col("text")) >= 5).count()
    assert(bands.count() == nScorable)
    val byBand = bands.groupBy("band").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBand.keySet.subsetOf(Set("head", "middle", "tail")))
    val selected = curated.join(
      bands.where(col("band") =!= "tail").select("doc_id"), Seq("doc_id"))
      .localCheckpoint()
    assert(selected.count() == byBand.getOrElse("head", 0L) +
      byBand.getOrElse("middle", 0L))

    // 3. keep-one exact-substring strip: text only ever loses tokens,
    //    ids are conserved
    val stripped = Dedup.stripExactSubstrSpans(selected, "doc_id",
      "text", minLen = 8, keepOne = true).localCheckpoint()
    assert(stripped.count() == selected.count())
    val grew = stripped
      .join(selected.withColumnRenamed("text", "orig"), Seq("doc_id"))
      .where(TextFunctions.tokenCountWs(col("text")) >
        TextFunctions.tokenCountWs(col("orig")))
      .count()
    assert(grew == 0)

    // 4. tokenize: train on the stripped corpus, encode, and the decode
    //    round trip reproduces the normalized text EXACTLY for every
    //    doc with at least one word
    val rules = Tokenizer.bpeTrain(stripped, "text", merges = 20)
    assert(rules.nonEmpty)
    val vocab = Tokenizer.vocabulary(stripped, "text", rules)
    val encoded = Tokenizer.encode(stripped, "doc_id", "text", rules)
    val decoded = Tokenizer.decode(encoded, "doc_id", "input_ids", vocab)
    val norm = stripped.select(col("doc_id"),
      concat_ws(" ", filter(split(lower(trim(col("text"))), "\\s+"),
        t => length(t) > 0)).as("want"))
      .where(length(col("want")) > 0)
    val mismatches = decoded.join(norm, Seq("doc_id"))
      .where(col("text") =!= col("want")).count()
    assert(mismatches == 0)
    assert(decoded.count() == norm.count())

    // 5. pack: every doc lands in exactly one shard of its group, and a
    //    shard overflows the budget by at most one trailing doc (the
    //    running-sum cut closes a shard only after crossing the budget)
    val budget = 120L
    val withTokens = stripped
      .withColumn("_n", TextFunctions.tokenCountWs(col("text")))
    val packed = DataPrep.packSequences(
      withTokens.withColumn("part", lit("all")),
      "doc_id", "part", col("_n"), budget)
    val shardStats = packed.agg(
      sum("n_docs").as("docs"), max("total_tokens").as("maxTok"))
      .collect()(0)
    assert(shardStats.getAs[Long]("docs") == stripped.count())
    val maxSingle = withTokens.agg(max("_n")).collect()(0).getLong(0)
    assert(shardStats.getAs[Long]("maxTok") < budget + maxSingle)

    // 6. terminal artifact: token ids → self-identifying binary
    //    payloads (doc_id as 8 LE bytes + ids as 4-byte LE ints) →
    //    TFRecord shards → CRC-verified read-back → ids survive
    //    bit-exact. This is the handoff a trainer actually consumes.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tfrec")
      .toString
    val payloads = encoded.select(col("doc_id"), col("input_ids"))
      .as[(Long, Seq[Int])]
      .map { case (id, ids) =>
        val bb = java.nio.ByteBuffer.allocate(8 + 4 * ids.length)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putLong(id)
        ids.foreach(bb.putInt)
        bb.array()
      }.toDF("payload")
    graft.sources.TfRecord.write(payloads, "payload", s"$dir/recs")
    val back = graft.sources.TfRecord.read(spark, s"$dir/recs")
      .select("payload").as[Array[Byte]]
      .map { bytes =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val id = bb.getLong
        (id, Seq.fill((bytes.length - 8) / 4)(bb.getInt))
      }.toDF("doc_id", "ids_back")
    assert(back.count() == encoded.count())
    val idMismatch = back
      .join(encoded, Seq("doc_id"), "full_outer")
      .where(col("input_ids").isNull || col("ids_back").isNull ||
        col("input_ids") =!= col("ids_back"))
      .count()
    assert(idMismatch == 0, "TFRecord round trip altered token ids")
  }
}
