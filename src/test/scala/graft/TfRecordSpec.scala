package graft

import graft.sources.TfRecord
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing: known-answer CRC fixtures, round trip, corruption
  * detection. */
class TfRecordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("frame layout matches the TFRecord spec on a known payload") {
    val payload = "abc".getBytes("UTF-8")
    val framed = TfRecord.frame(payload)
    assert(framed.length == 8 + 4 + 3 + 4)
    // length field: 3 as uint64 LE
    assert(framed.take(8).toSeq ==
      Seq[Byte](3, 0, 0, 0, 0, 0, 0, 0))
    // payload sits after the 12-byte header
    assert(framed.slice(12, 15).toSeq == payload.toSeq)
    // masked crc is pure arithmetic over CRC32C — pin the mask identity
    val c = new java.util.zip.CRC32C
    c.update(payload, 0, 3)
    val crc = c.getValue
    val expected = ((((crc >>> 15) | (crc << 17)) & 0xffffffffL) +
      0xa282ead8L) & 0xffffffffL
    assert(TfRecord.maskedCrc32c(payload) == expected)
  }

  test("write → read round trip preserves payload multiset and order " +
      "within files") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec").toString
    val docs = (0 until 500)
      .map(i => (i.toLong, s"""{"doc_id":$i,"text":"payload $i"}"""))
      .toDF("doc_id", "js")
      .repartition(4)
    TfRecord.write(docs, "js", s"$dir/out")
    val back = TfRecord.read(spark, s"$dir/out")
    assert(back.count() == 500)
    val payloads = back.select(col("payload").cast("string"))
      .as[String].collect().toSet
    val expected = (0 until 500)
      .map(i => s"""{"doc_id":$i,"text":"payload $i"}""").toSet
    assert(payloads == expected)
    // record_idx is dense per file, starting at 0
    val perFile = back.groupBy("file")
      .agg(count(lit(1)).as("n"), min("record_idx").as("lo"),
        max("record_idx").as("hi")).collect()
    assert(perFile.forall(r =>
      r.getAs[Long]("lo") == 0L &&
      r.getAs[Long]("hi") == r.getAs[Long]("n") - 1))
    // empty payloads frame fine too
    val dir2 = s"$dir/empty"
    TfRecord.write(Seq(("", 1)).toDF("p", "x").select(col("p")), "p", dir2)
    assert(TfRecord.read(spark, dir2).count() == 1)
  }

  test("a flipped payload bit fails loudly with file + record index") {
    val dir = java.nio.file.Files.createTempDirectory("tfrec-bad").toString
    TfRecord.write(Seq("good record").toDF("p").coalesce(1), "p", dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    bytes(13) = (bytes(13) ^ 0x01).toByte // inside the payload
    java.nio.file.Files.write(f.toPath, bytes)
    // drop Hadoop LocalFileSystem's .crc sidecar: on local disk it
    // detects the flip before our framing check can — S3A/object
    // stores have no sidecar, and the record-level CRC is the
    // guarantee that travels with the file
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val e = intercept[org.apache.spark.SparkException] {
      TfRecord.read(spark, dir).count()
    }
    // Spark wraps the reader failure (FAILED_READ_FILE) — the crc
    // detail lives down the cause chain
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .toSeq
    assert(messages.exists(_.contains("crc mismatch")), messages.mkString(" | "))
  }
}
