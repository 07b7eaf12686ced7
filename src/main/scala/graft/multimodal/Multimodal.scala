package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: opaque `binary` payload + typed metadata struct, with
  * decode / feature-extract / frame-sample as per-partition batch
  * transforms.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * DETERMINISTIC STUB (clearly marked below); everything around it — the
  * schema contract, the lazy per-partition batching, the output shapes —
  * is real and tested. A production build swaps `stubDecode` for a JNI/
  * javax.imageio decoder without touching any plumbing.
  *
  * Scale notes: payloads stay opaque bytes end-to-end (no driver
  * collection, no string round-trip); `mapPartitions` keeps the iterator
  * lazy so a partition never materializes more than one batch of decoded
  * features; metadata-only queries prune the binary column at the parquet
  * reader (columnar projection — verified by ReadSchema in explain).
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Deterministic fake media table derived from any keyed frame — test
    * fixture generator (payload bytes are a seeded function of the id). */
  def syntheticMedia(df: DataFrame, idCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      // payload: id rendered through sha2 twice → 128 pseudo-random bytes
      to_binary(concat(
        sha2(col(idCol).cast("string"), 256),
        sha2(concat(col(idCol).cast("string"), lit("x")), 256)), lit("hex"))
        .as("payload"),
      struct(
        lit("image/fake").as("mime"),
        (pmod(col(idCol), lit(64)) + 32).cast("int").as("width"),
        (pmod(col(idCol), lit(48)) + 24).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))

  /** ======== STUB ========
    * Stand-in for a real image decode + feature extraction. Deterministic
    * pure function of the payload bytes: "decodes" a byte histogram and a
    * 16-dim folded-byte embedding. Replace with a real codec here — the
    * signature (bytes → (ok, features)) is the integration point.
    */
  private[multimodal] def stubDecode(payload: Array[Byte])
      : (Boolean, Array[Float]) = {
    if (payload == null || payload.length < 16) (false, Array.empty)
    else {
      val emb = new Array[Float](16)
      var i = 0
      while (i < payload.length) {
        emb(i % 16) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      val n = payload.length / 16.0f
      (true, emb.map(_ / n))
    }
  }

  private val featSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("decode_ok", BooleanType),
    StructField("embedding", ArrayType(FloatType))))

  /** Decode + feature-extract as a lazy per-partition batch transform.
    * Input needs media_id + payload; binary never leaves the executor. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val (ok, emb) = stubDecode(
          if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1))
        Row(id, ok, emb.toSeq)
      }
    }
    spark.createDataFrame(out, featSchema)
  }

  /** ======== STUB ========
    * Resize: produce a payload scaled to `w`×`h` with updated metadata.
    * The stub "resampler" picks bytes at a stride proportional to the
    * area ratio (deterministic); a real image scaler replaces only
    * `stubResample` — schema, meta update, and plumbing stay.
    */
  private[multimodal] def stubResample(payload: Array[Byte],
      targetLen: Int): Array[Byte] = {
    if (payload == null || payload.isEmpty || targetLen <= 0)
      return Array.empty
    Array.tabulate(targetLen)(i =>
      payload((i.toLong * payload.length / targetLen).toInt))
  }

  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "payload", "meta").rdd.mapPartitions {
      it =>
        it.map { r =>
          val payload =
            if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          val srcArea = math.max(1,
            meta.getAs[Int]("width") * meta.getAs[Int]("height"))
          val targetLen =
            if (payload == null) 0
            else math.max(1, (payload.length.toLong * w * h / srcArea).toInt)
          Row(r.getLong(0), stubResample(payload, targetLen),
            Row(meta.getAs[String]("mime"), w, h,
              meta.getAs[java.lang.Long]("duration_ms")))
        }
    }
    spark.createDataFrame(out, mediaSchema)
  }

  /** Frame sampling for video payloads: emit every `stride`-th fixed-size
    * chunk as a frame row (stub chunking; a real demuxer plugs in the same
    * way). Output (media_id, frame_idx, frame_bytes). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32,
      stride: Int = 2): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val out = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        if (r.isNullAt(1)) Iterator.empty
        else {
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val nFrames = bytes.length / frameBytes
          (0 until nFrames by stride).iterator.map { f =>
            Row(id, f, bytes.slice(f * frameBytes, (f + 1) * frameBytes))
          }
        }
      }
    }
    spark.createDataFrame(out, schema)
  }
}
