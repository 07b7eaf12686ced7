package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over embedding columns — the full-corpus
  * alternative to [[SimilaritySearch]]'s bounded-sample `trainCentroids`
  * (which collects ≤ 50k rows to the driver). Every iteration here is
  * ONE map-side-combining aggregation over the whole corpus:
  *
  *  - assignment is row-local under a BROADCAST centroid table (k × dim
  *    longs — tiny), so no shuffle ever touches the vectors;
  *  - the shuffle carries only per-cluster partials — ≤ k rows per map
  *    task, each (count, Σvec) — via a typed mergeable [[Aggregator]]
  *    (the HeavyHitters tier of the extension ladder);
  *  - driver state is k × dim, independent of corpus size.
  *
  * Determinism discipline (the q_dsir / q_bm25 rule): vectors are
  * floor-quantized to integers ONCE (floor(x × scale)); distances and
  * per-cluster sums are exact integer arithmetic; the centroid update is
  * floor(sum × 1.0 / count) back in quantized space (double division —
  * exact while |sum| < 2⁵³, i.e. up to ~8×10¹⁵ quantized mass per
  * cluster-dim; DuckDB's integer `//` truncates instead of flooring, so
  * the double-floor form is the portable one). The result is therefore
  * bit-identical under any partitioning/run order, and one full
  * iteration is SQL-expressible — q_kmeans_iter replays init,
  * assignment (lowest-index tie-break) and update exactly.
  *
  * Init = the k rows with the smallest (md5(id), id) — the portable
  * md5-draw convention (q_ccnet_bands / q_stratified_sample). Empty
  * clusters keep their previous centroid (`trainCentroids`'s
  * convention); convergence = quantized centroids unchanged, an exact
  * integer comparison with no epsilon.
  */
object KMeans {

  /** Mergeable (count, Σvec) buffer; `sums` empty until the first row. */
  case class VecBuf(n: Long, sums: Seq[Long])

  /** Element-wise vector sum + count — constant k×dim state per task. */
  object VecSumAgg extends Aggregator[Seq[Long], VecBuf, VecBuf] {
    def zero: VecBuf = VecBuf(0L, Nil)
    private def add(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else {
        val r = a.toArray
        var j = 0
        while (j < r.length) { r(j) += b(j); j += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(r)
      }
    def reduce(b: VecBuf, v: Seq[Long]): VecBuf =
      VecBuf(b.n + 1, add(b.sums, v))
    def merge(x: VecBuf, y: VecBuf): VecBuf =
      VecBuf(x.n + y.n, add(x.sums, y.sums))
    def finish(b: VecBuf): VecBuf = b
    def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    def outputEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  }

  /** Floor-quantized integer rendering of a float/double vector column. */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec.cast("array<double>"), x => floor(x * scale).cast("long"))

  /** The k (md5(id), id)-smallest quantized rows — deterministic,
    * SQL-portable, and a k-row driver action (k is bounded small). */
  def initCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, scale: Int): Array[Array[Long]] =
    df.select(quantize(col(vecCol), scale).as("q"),
        md5(col(idCol).cast("string")).as("_m"), col(idCol).as("_i"))
      .orderBy("_m", "_i").limit(k)
      .select("q").collect().map(_.getSeq[Long](0).toArray)

  /** The n nearest centroid indexes by exact integer squared distance,
    * ties to the LOWER index (so head == [[nearest]] — the assignment
    * convention) — the multi-probe primitive
    * ([[SemDedup.verdicts]] probeCells). k is bounded small, so the
    * full sort is row-local and cheap. */
  private[operators] def nearestN(q: Seq[Long],
      cs: Array[Array[Long]], n: Int): Seq[Int] = {
    val ds = new Array[(Long, Int)](cs.length)
    var c = 0
    while (c < cs.length) {
      val ctr = cs(c)
      var d = 0L
      var j = 0
      while (j < ctr.length) { val t = q(j) - ctr(j); d += t * t; j += 1 }
      ds(c) = (d, c)
      c += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      ds.sorted.take(n).map(_._2))
  }

  /** Row-local multi-probe assignment: the `n` nearest centroid
    * indexes per row as an array column (broadcast centroids, no
    * shuffle — the [[assign]] shape). element 0 always equals
    * [[assign]]'s cluster. */
  def assignN(df: DataFrame, vecCol: String, scale: Int,
      centroids: Array[Array[Long]], n: Int,
      outCol: String = "cells"): DataFrame = {
    require(n >= 1 && n <= centroids.length,
      s"n=$n outside [1, k=${centroids.length}]")
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assignU = udf { (q: Seq[Long]) => nearestN(q, bc.value, n) }
    df.withColumn(outCol, assignU(quantize(col(vecCol), scale)))
  }

  /** Nearest centroid by exact integer squared distance; ties break to
    * the lowest cluster index (strict `<`). */
  private[operators] def nearest(q: Seq[Long],
      cs: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cs.length) {
      val ctr = cs(c)
      var d = 0L
      var j = 0
      while (j < ctr.length) { val t = q(j) - ctr(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** One Lloyd step under the given centroids: per cluster, (n_assigned,
    * new quantized centroid). The unit q_kmeans_iter replays in SQL.
    * Input may be the raw frame (quantizes itself) — pass an already-
    * quantized projection via `preQuantized = true` to skip the cast. */
  def iterate(df: DataFrame, vecCol: String, scale: Int,
      centroids: Array[Array[Long]],
      preQuantized: Boolean = false): Array[(Int, Long, Array[Long])] = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assignU = udf { (q: Seq[Long]) => nearest(q, bc.value) }
    val agg = udaf(VecSumAgg)
    val q = if (preQuantized) df.select(col(vecCol).as("q"))
      else df.select(quantize(col(vecCol), scale).as("q"))
    val stats = q
      .withColumn("cluster", assignU(col("q")))
      .groupBy("cluster").agg(agg(col("q")).as("s"))
      .collect()
      .map(r => r.getInt(0) -> {
        val s = r.getStruct(1)
        (s.getLong(0), s.getSeq[Long](1))
      }).toMap
    val out = centroids.indices.map { c =>
      stats.get(c) match {
        case Some((n, sums)) =>
          (c, n, sums.map(s => math.floor(s * 1.0 / n).toLong).toArray)
        case None => (c, 0L, centroids(c)) // empty cell keeps its center
      }
    }.toArray
    bc.destroy()
    out
  }

  /** Full training loop: one aggregation job per iteration over a
    * persisted quantized projection, stopping early on exact
    * convergence. Returns quantized centroids (k × dim longs). */
  def train(df: DataFrame, idCol: String, vecCol: String, k: Int,
      maxIters: Int = 20, scale: Int = 1024): Array[Array[Long]] = {
    val q = df.select(quantize(col(vecCol), scale).as("q"),
        col(idCol).as("_i"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cs = q.select(col("q"), md5(col("_i").cast("string")).as("_m"),
          col("_i"))
        .orderBy("_m", "_i").limit(k)
        .select("q").collect().map(_.getSeq[Long](0).toArray)
      var it = 0
      var converged = false
      while (it < maxIters && !converged) {
        val next = iterate(q, "q", scale, cs, preQuantized = true)
          .map(_._3)
        converged = next.zip(cs).forall { case (a, b) => a.sameElements(b) }
        cs = next
        it += 1
      }
      cs
    } finally q.unpersist()
  }

  /** Centroids back in float space (for [[SimilaritySearch.ivfTopK]]'s
    * `trainedCentroids` hook). */
  def dequantize(centroids: Array[Array[Long]],
      scale: Int): Array[Array[Double]] =
    centroids.map(_.map(_.toDouble / scale))

  /** Row-local cluster assignment under broadcast centroids. */
  def assign(df: DataFrame, vecCol: String, scale: Int,
      centroids: Array[Array[Long]], outCol: String = "cluster")
      : DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(centroids)
    val assignU = udf { (q: Seq[Long]) => nearest(q, bc.value) }
    df.withColumn(outCol, assignU(quantize(col(vecCol), scale)))
  }
}
