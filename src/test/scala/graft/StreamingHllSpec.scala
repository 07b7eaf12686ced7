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
}
