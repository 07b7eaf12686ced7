package graft

import java.nio.file.Files

import graft.functions.TextFunctions
import graft.sources.DocJsonl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocJsonlSpec extends AnyFunSuite {
  import SparkTestSession._

  test("jsonl round-trip preserves the corpus; corrupt and incomplete " +
      "lines quarantine instead of failing the read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl").toFile
    val docs = Seq(
      (1L, "alpha beta", "en", "src0", Map("crawl" -> "c1")),
      (2L, "gamma delta", "en", "src1", Map.empty[String, String]))
      .toDF("doc_id", "text", "lang", "source", "meta")
    DocJsonl.write(docs, s"$dir/out")
    // filtering on _corrupt_record requires the parsed frame to be
    // cached (Spark refuses it on a raw-files query) — readValidated
    // does that internally
    val (backGood, backBad) = DocJsonl.readValidated(spark, s"$dir/out")
    assert(backBad.count() == 0)
    assert(backGood.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "alpha beta"), (2L, "gamma delta")))

    // hand-written shard: one good, one corrupt, one missing text
    Files.writeString(new java.io.File(dir, "shard.jsonl").toPath,
      """{"doc_id": 10, "text": "good line", "lang": "en", "source": "s"}
        |{"doc_id": 11, "text": "truncated
        |{"doc_id": 12, "lang": "en", "source": "s"}
        |""".stripMargin)
    val (good, bad) = DocJsonl.readValidated(spark,
      new java.io.File(dir, "shard.jsonl").getAbsolutePath)
    assert(good.select("doc_id").collect().map(_.getLong(0)).toSeq ==
      Seq(10L))
    assert(bad.count() == 2)
  }

  test("write partitions by source for pruned re-reads") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-jsonl-part").toFile
    val docs = Seq((1L, "a", "en", "src0"), (2L, "b", "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("meta", map().cast("map<string,string>"))
    DocJsonl.write(docs, s"$dir/out", partitionCols = Seq("source"))
    assert(new java.io.File(s"$dir/out/source=src0").exists())
    val pruned = DocJsonl.read(spark, s"$dir/out")
      .where(col("source") === "src0")
    assert(pruned.count() == 1)
  }

  test("compressionRatio separates looped spam from varied text and is " +
      "deterministic") {
    import spark.implicits._
    val varied = (1 to 40)
      .map(i => s"word$i thing$i item${i * 7 % 13}").mkString(" ")
    val loops = Seq.fill(40)("same phrase over and over").mkString(" ")
    val df = Seq((1L, varied), (2L, loops), (3L, ""), (4L, null))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        TextFunctions.compressionRatio(col("text")).as("cr"))
    val got = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) < 0.2, s"looped text should compress hard: ${got(2L)}")
    assert(got(1L) > got(2L) * 2,
      s"varied ${got(1L)} vs looped ${got(2L)}")
    assert(got(3L) == 1.0 && got(4L) == 1.0)
    // determinism: re-evaluation yields identical bits
    val again = Seq((2L, loops)).toDF("doc_id", "text")
      .select(TextFunctions.compressionRatio(col("text")))
      .head().getDouble(0)
    assert(again == got(2L))
  }
}
