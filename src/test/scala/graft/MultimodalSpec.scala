package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def media = {
    import spark.implicits._
    Multimodal.syntheticMedia((0L until 50L).toDF("id"), "id")
  }

  test("synthetic media are real PNGs that ImageIO decodes to their meta") {
    val rows = media.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val p = r.getAs[Array[Byte]]("payload")
      // PNG magic
      assert((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G')
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[String]("mime") == "image/png")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(p))
      assert(img.getWidth == meta.getAs[Int]("width"))
      assert(img.getHeight == meta.getAs[Int]("height"))
    }
  }

  test("real decode recovers dimensions and solid color exactly") {
    val feats = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(feats.size == 50)
    feats.foreach { case (id, r) =>
      val (w, h, rgb) = Multimodal.syntheticSpec(id)
      assert(r.getBoolean(1), s"decode_ok false for $id")
      assert(r.getInt(2) == w && r.getInt(3) == h)
      val emb = r.getSeq[Float](4)
      assert(emb.length == Multimodal.embeddingDim)
      // solid color: channel means == rgb/255 exactly; grid cells equal
      // the global means
      assert(math.round(emb(0) * 255) == ((rgb >> 16) & 0xff))
      assert(math.round(emb(1) * 255) == ((rgb >> 8) & 0xff))
      assert(math.round(emb(2) * 255) == (rgb & 0xff))
      assert(math.abs(emb(3) - w.toFloat / h) < 1e-6)
      (0 until 4).foreach { c =>
        assert(emb(4 + c * 3) == emb(0) && emb(4 + c * 3 + 1) == emb(1) &&
          emb(4 + c * 3 + 2) == emb(2))
      }
    }
  }

  test("undecodable payloads degrade to byte-fold with decode_ok=false") {
    import spark.implicits._
    val junk = Seq((1L, Array.fill[Byte](64)(42)), (2L, Array[Byte]()))
      .toDF("media_id", "payload")
    val out = Multimodal.extractFeatures(junk).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out(1L).getBoolean(1) && !out(2L).getBoolean(1))
    assert(out(1L).isNullAt(2) && out(1L).isNullAt(3))
    assert(out(1L).getSeq[Float](4).length == Multimodal.embeddingDim)
  }

  test("frame sampling emits strided fixed-size chunks") {
    val lens = media.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").length)
      .toMap
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2)
      .collect()
    val expected = lens.values.map(l => (l / 16 + 1) / 2).sum
    assert(frames.length == expected)
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 16))
    assert(frames.forall(_.getInt(1) % 2 == 0))
  }

  test("resize really rescales decodable images (dims + color preserved)") {
    val small = Multimodal.resize(media, 16, 12)
    val rows = small.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val meta = r.getAs[org.apache.spark.sql.Row]("meta")
      assert(meta.getAs[Int]("width") == 16)
      assert(meta.getAs[Int]("height") == 12)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("payload")))
      assert(img.getWidth == 16 && img.getHeight == 12)
      // bilinear rescale of a solid image keeps the color
      val (_, _, rgb) = Multimodal.syntheticSpec(r.getLong(0))
      assert((img.getRGB(8, 6) & 0xffffff) == rgb)
    }
    // deterministic
    val again = Multimodal.resize(media, 16, 12).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    val first = rows.map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    assert(again == first)
  }
}
