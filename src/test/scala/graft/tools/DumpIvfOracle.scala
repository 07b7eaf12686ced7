package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generator for the q_ann_ivf pinned-centroid oracle
  * (graft.queries.IvfOracle).
  *
  * The IVF coarse quantizer is deterministic (seed 42, hash-sampled
  * id-ordered training set, fixed 20 Lloyd iterations), so the centroids
  * trained at the correctness-gate SF can be inlined as SQL literals and
  * the whole assign → probe → rank pipeline replayed exactly in DuckDB.
  * This main re-trains at the given SF dir and prints the oracle SQL;
  * paste its output into IvfOracle.sql whenever the quantizer, its
  * parameters (nlist/nprobe/k/seed), or the gate SF change.
  *
  * Run: sbt "Test/runMain graft.operators.DumpIvfOracle /root/testdata/sf0.01"
  */
object DumpIvfOracle {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // EXACT replay of SimilaritySearch.ivfTopK's training-sample selection
    val maxTrain = 50000
    val c = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("v"))
    val corpusN = c.count()
    val every = math.max(1L, corpusN / maxTrain)
    val sample = c
      .where(pmod(xxhash64(col("id")), lit(every)) === 0)
      .orderBy("id")
      .limit(maxTrain)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    val centroids = SimilaritySearch
      .trainCentroids(sample, nlist = 8, iters = 20, seed = 42)

    // Java's Double.toString is the shortest round-tripping repr; DuckDB's
    // correctly-rounded parse recovers the identical bits, so the SQL
    // distances replay the Scala kernel's arithmetic exactly.
    val dim = centroids(0).length
    val rows = centroids.zipWithIndex.map { case (ctr, i) =>
      s"    ($i, [${ctr.mkString(", ")}])"
    }.mkString(",\n")
    val sql =
      s"""WITH cent AS (
         |  SELECT cell, CAST(cv AS DOUBLE[]) AS cv FROM (VALUES
         |$rows
         |  ) AS t(cell, cv)
         |), e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |), ad AS (
         |  SELECT e.vec_id, e.v, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      list_sum(list_transform(range(1, ${dim + 1}),
         |        i -> (c.cv[i] - e.v[i]) * (c.cv[i] - e.v[i]))), c.cell) AS rn
         |  FROM e CROSS JOIN cent c
         |), assigned AS (
         |  SELECT vec_id, v, cell FROM ad WHERE rn = 1
         |), q AS (
         |  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5
         |), qd AS (
         |  SELECT q.query_id, q.qv, c.cell,
         |    row_number() OVER (PARTITION BY q.query_id ORDER BY
         |      list_sum(list_transform(range(1, ${dim + 1}),
         |        i -> (c.cv[i] - q.qv[i]) * (c.cv[i] - q.qv[i]))), c.cell) AS rn
         |  FROM q CROSS JOIN cent c
         |), probed AS (
         |  SELECT query_id, qv, cell FROM qd WHERE rn <= 4
         |), scored AS (
         |  SELECT p.query_id, a.vec_id AS id,
         |    list_cosine_similarity(a.v, p.qv) AS cosine
         |  FROM assigned a JOIN probed p USING (cell)
         |  WHERE a.vec_id != p.query_id
         |), ranked AS (
         |  SELECT query_id, id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, id) AS rank
         |  FROM scored
         |)
         |SELECT query_id, id, rank, round(cosine, 6) AS cosine
         |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    println("=== BEGIN IVF ORACLE SQL ===")
    println(sql)
    println("=== END IVF ORACLE SQL ===")
    spark.stop()
  }
}
