package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def media = {
    import spark.implicits._
    Multimodal.syntheticMedia((0L until 50L).toDF("id"), "id")
  }

  test("synthetic media carries 64-byte payloads with typed metadata") {
    val rows = media.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").length == 64)
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[String]("mime") == "image/fake")
      assert(meta.getAs[Int]("width") >= 32)
    }
  }

  test("feature extraction is deterministic, 16-dim, all decode_ok") {
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1.size == 50)
    assert(f1.values.forall(_.length == 16))
    assert(f1 == f2)
    // distinct payloads → distinct embeddings
    assert(f1.values.toSeq.distinct.length == 50)
  }

  test("frame sampling emits strided fixed-size chunks") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .collect()
    // 64-byte payloads → 4 frames of 16 → stride 2 → idx {0, 2} per media
    assert(frames.length == 100)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 16))
    assert(frames.map(_.getInt(1)).distinct.sorted.toSeq == Seq(0, 2))
  }

  test("resize rescales payload length and rewrites dimensions") {
    val small = Multimodal.resize(media, 16, 12)
    val rows = small.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[Int]("width") == 16)
      assert(meta.getAs[Int]("height") == 12)
      val p = r.getAs[Array[Byte]]("payload")
      assert(p.length > 0 && p.length < 64) // shrunk from 64 source bytes
    }
    // deterministic
    val again = Multimodal.resize(media, 16, 12).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    val first = rows.map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(again == first)
  }
}
