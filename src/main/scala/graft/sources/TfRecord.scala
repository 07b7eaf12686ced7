package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TFRecord sink/source — the standard training-data interchange
  * framing (TensorFlow's `tf.data.TFRecordDataset` / `TFRecordWriter`;
  * format documented in the TensorFlow source: each record is
  * `[length: uint64 LE][masked crc32c(length): uint32 LE][payload]
  * [masked crc32c(payload): uint32 LE]`, mask(c) = ((c >>> 15) |
  * (c << 17)) + 0xa282ead8, CRC32C = Castagnoli — `java.util.zip.CRC32C`
  * in the JDK since 9, so this needs no dependency).
  *
  * The PAYLOAD is caller-provided bytes (a serialized `tf.train.Example`
  * proto, UTF-8 JSON, packed token ids…) — TFRecord itself is only the
  * framing, and this operator deliberately stops there: what goes in a
  * record is the pipeline's concern ([[graft.operators.DataPrep]]
  * builds the payloads), how records survive a copy is this file's.
  *
  * Scale shape: the sink is one `foreachPartition` pass writing
  * `part-NNNNN.tfrecord` per input partition through the Hadoop
  * FileSystem API (works on HDFS/S3A/local alike, the same mechanism
  * Spark's own sinks use); no driver materialization, no shuffle. The
  * source reads via Spark's `binaryFile` format (splittable at file
  * grain — the same parallelism contract the sink wrote) and re-frames
  * with both CRCs VERIFIED per record — a flipped bit fails loudly with
  * file + record index instead of corrupting a training run.
  */
object TfRecord {

  private val MaskDelta = 0xa282ead8L

  /** TFRecord's masked CRC32C over `bytes` as an unsigned int in a
    * Long (mask(c) = ((c >>> 15) | (c << 17)) + delta, mod 2³²). */
  def maskedCrc32c(bytes: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32C
    c.update(bytes, 0, bytes.length)
    val crc = c.getValue // unsigned 32-bit in a Long
    val rot = ((crc >>> 15) | (crc << 17)) & 0xffffffffL
    (rot + MaskDelta) & 0xffffffffL
  }

  private def leLong(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  private def leInt(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()

  /** One framed record: length + masked len-crc + payload + masked
    * payload-crc. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val len = leLong(payload.length.toLong)
    val buf = new java.io.ByteArrayOutputStream(payload.length + 16)
    buf.write(len)
    buf.write(leInt(maskedCrc32c(len)))
    buf.write(payload)
    buf.write(leInt(maskedCrc32c(payload)))
    buf.toByteArray
  }

  /** Write `payloadCol` (binary or string — strings are UTF-8 encoded)
    * as `dir/part-NNNNN.tfrecord`, one file per non-empty partition.
    * Order within a partition is the input order; callers needing a
    * global layout sort/repartition first (the goldParquet contract).
    *
    * Commit discipline: each task attempt writes an attempt-unique
    * `.inprogress` temp and renames into place only after a clean
    * close — so a failed/zombie/speculative attempt can never leave a
    * half-written or interleaved `.tfrecord` (and [[read]] only loads
    * `*.tfrecord`, so stray temps are invisible). If another attempt
    * already committed the same partition, this attempt discards its
    * temp. Rename is atomic on HDFS/local; on S3A it is a copy —
    * single-writer-per-partition still holds, but prefer a cluster
    * committer-backed format there if multi-job concurrency matters.
    * Keep input partitions comfortably under 2 GB (repartition first):
    * [[read]] loads one shard per task via binaryFile.
    *
    * Cross-JOB reruns are guarded on the driver, not in the tasks: a
    * non-empty destination fails fast (or is deleted whole with
    * `overwrite = true`), because a per-file rename can't distinguish
    * "sibling attempt committed this shard" from "stale shard survived
    * a previous run" — and a rerun with fewer partitions would
    * otherwise leave stale extra shards that [[read]] silently
    * includes. Inside one job, a rename failure is treated as a
    * duplicate commit ONLY when the destination actually exists (a
    * sibling attempt's file); any other rename failure throws. */
  def write(df: DataFrame, payloadCol: String, dir: String,
      overwrite: Boolean = false): Unit = {
    val hconf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val driverFs = dirPath.getFileSystem(hconf.value)
    if (driverFs.exists(dirPath) &&
        driverFs.listStatus(dirPath).nonEmpty) {
      if (overwrite) { driverFs.delete(dirPath, true); () }
      else throw new IllegalStateException(
        s"TfRecord.write: destination $dir exists and is non-empty — " +
        "pass overwrite = true to replace it (stale shards from a " +
        "previous run would otherwise survive into read())")
    }
    df.select(col(payloadCol).cast("binary").as("p"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        if (rows.hasNext) {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val dest = new org.apache.hadoop.fs.Path(
            dir, f"part-$pid%05d.tfrecord")
          val tmp = new org.apache.hadoop.fs.Path(
            dir, f".part-$pid%05d-attempt${tc.taskAttemptId()}.inprogress")
          val fs = dest.getFileSystem(hconf.value)
          if (!fs.exists(dest)) { // else: a sibling attempt already won
            val out = fs.create(tmp, true)
            var ok = false
            try {
              var i = 0L
              rows.foreach { r =>
                require(!r.isNullAt(0),
                  s"TfRecord.write: null payload at partition $pid " +
                  s"row $i — TFRecord framing has no null; filter or " +
                  "fill upstream")
                out.write(frame(r.getAs[Array[Byte]](0)))
                i += 1
              }
              ok = true
            } finally {
              out.close()
              if (ok) {
                // first committer wins; a losing duplicate attempt
                // removes its temp and leaves the committed file alone
                if (!fs.rename(tmp, dest)) {
                  fs.delete(tmp, false)
                  // the driver emptied the dir before this job, so a
                  // surviving dest can only be a sibling attempt's
                  // commit; anything else is a real filesystem error
                  if (!fs.exists(dest)) throw new java.io.IOException(
                    s"TfRecord.write: rename $tmp -> $dest failed and " +
                    "no committed shard exists")
                }
              } else fs.delete(tmp, false): Unit
            }
          }
        }
      }
  }

  /** Read a TFRecord directory back as (file, record_idx, payload),
    * verifying BOTH CRCs per record. Corrupt framing throws with the
    * file and record index. File-grain parallelism (binaryFile source);
    * record_idx is the in-file position, so (file, record_idx) is a
    * stable global identity. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val bb = java.nio.ByteBuffer.wrap(bytes)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Array[Byte])]
        var idx = 0L
        while (bb.remaining() > 0) {
          require(bb.remaining() >= 12,
            s"$path: truncated header at record $idx")
          val lenBytes = new Array[Byte](8)
          bb.get(lenBytes)
          val len = java.nio.ByteBuffer.wrap(lenBytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
          val lenCrc = bb.getInt & 0xffffffffL
          require(lenCrc == maskedCrc32c(lenBytes),
            s"$path: length crc mismatch at record $idx")
          require(len >= 0 && len <= bb.remaining() - 4,
            s"$path: bad length $len at record $idx")
          val payload = new Array[Byte](len.toInt)
          bb.get(payload)
          val dataCrc = bb.getInt & 0xffffffffL
          require(dataCrc == maskedCrc32c(payload),
            s"$path: payload crc mismatch at record $idx")
          out += ((path, idx, payload))
          idx += 1
        }
        out
      }
      .toDF("file", "record_idx", "payload")
  }
}
