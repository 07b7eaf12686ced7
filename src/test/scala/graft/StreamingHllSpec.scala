package graft

import graft.operators.Hll
import graft.streaming.StreamingHll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingHllSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming registers converge to the batch sketch of all arrived " +
      "keys; estimate matches the batch twin exactly") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = StreamingHll.registerStream(input.toDF().toDF("k"), col("k"))
      .writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val batch1 = (0 until 2000).map(i => s"key-$i")
      val batch2 = (1000 until 3000).map(i => s"key-$i") // 1000 overlap
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val streamRegs = spark.sql("SELECT bucket, min_len FROM hll_stream")
      // exact state equality with the batch sketch of everything arrived
      val batchRegs = Hll.registers(
        (batch1 ++ batch2).toDF("k"), col("k"))
      assert(streamRegs.count() <= Hll.M)
      assert(streamRegs.exceptAll(batchRegs).isEmpty &&
        batchRegs.exceptAll(streamRegs).isEmpty,
        "stream register state != batch registers")
      // estimator consumes the snapshot unchanged
      val se = Hll.estimateFromRegisters(streamRegs).head()
      val be = Hll.estimate((batch1 ++ batch2).toDF("k"), col("k")).head()
      assert(se.getAs[Long]("s_scaled") == be.getAs[Long]("s_scaled"))
      assert(se.getAs[Long]("est_q") == be.getAs[Long]("est_q"))
    } finally q.stop()
  }

  test("streaming distinct-n registers converge to the batch sketch " +
      "across interleaved micro-batches; the snapshot report equals " +
      "the batch distinctNApprox bit-for-bit (incl. exact totals)") {
    import graft.operators.EvalMetrics
    import graft.streaming.StreamingDistinctN
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = StreamingDistinctN.registerStream(
        input.toDF().toDF("source", "text"), "source", "text")
      .writeStream.format("memory").queryName("dn_stream")
      .outputMode("complete").start()
    try {
      // interleaved per-source batches with heavy repetition (the
      // mode-collapse shape) and vocabulary growth across batches
      val batch1 = (0 until 150).map(i =>
        ("gen-a", s"the cat sat token${i % 20} on the mat"))
      val batch2 = (0 until 150).map(i =>
        ("gen-b", s"alpha beta token$i gamma token${i + 500}"))
      val batch3 = (0 until 100).map(i =>
        ("gen-a", s"the cat sat token${i % 40} fresh${i % 7} mat"))
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      input.addData(batch3: _*)
      q.processAllAvailable()
      val all = (batch1 ++ batch2 ++ batch3).toDF("source", "text")
      val snap = spark.sql("SELECT * FROM dn_stream")
      val batchRegs = EvalMetrics.gramRegisters(all, "source", "text",
        Seq(1, 2, 3))
      assert(snap.exceptAll(batchRegs).isEmpty &&
        batchRegs.exceptAll(snap).isEmpty,
        "stream register state != batch registers")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toString).sorted.toSeq
      // the snapshot report IS the batch report — same integer
      // estimator, exact totals riding the bucket counts
      assert(canon(EvalMetrics.approxFromRegisters(snap, "source")) ==
        canon(EvalMetrics.distinctNApprox(all, "source", "text")))
    } finally q.stop()
  }
}
