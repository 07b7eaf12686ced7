package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing = the co-located-join scale path (SURVEY §4 / the build
  * brief's partitioning bullet): two tables bucketed on the join key join
  * WITHOUT a shuffle on either side. At 100 TB this is how repeated joins
  * on `raw_event_hash_id` / `device_id` amortize their shuffle to write
  * time once.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("join of co-bucketed tables plans no shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 5000L).map(i => (i, s"a$i")).toDF("k", "va")
      val b = (1L to 5000L).map(i => (i, i * 2.0)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .saveAsTable("bkt_b")

      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 5000)

      // control: the same join on plain tables DOES shuffle
      val plain = a.join(b, "k")
      assert(plain.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
