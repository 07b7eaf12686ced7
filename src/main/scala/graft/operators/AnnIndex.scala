package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index: build ONCE, probe many times — the serving
  * shape a 100 TB vector corpus actually needs. [[SimilaritySearch.ivfTopK]]
  * re-trains its quantizer and re-assigns the whole corpus per call,
  * which is right for one-shot analytics and wrong for a query service;
  * this operator materializes the index as two plain parquet tables
  *
  *   <path>/centroids    (cell, centroid)            — tiny, nlist rows
  *   <path>/assignments  (id, v) PARTITIONED BY cell — the corpus
  *
  * so a probe reads ONLY its nprobe cells via Hive-style partition
  * pruning (`PartitionFilters: [cell IN (...)]` — the scan never
  * touches the other nlist − nprobe directories, which is the entire
  * point at 100 TB: disk layout IS the index). Plain parquet keeps the
  * index queryable by any engine — there is no binary sidecar format to
  * version.
  *
  * New batches append via [[append]] WITHOUT retraining: vectors are
  * assigned to the existing centroids and written into their cell
  * directories (dynamic partition overwrite is deliberately NOT used —
  * appends are additive). Centroid drift under sustained appends is a
  * re-[[build]] decision, same as any IVF system.
  */
object AnnIndex {

  /** Meta schema version written by [[build]]. Pre-versioned indexes
    * (no `<path>/meta` directory) are read with the contract checks
    * skipped; the vector-dimension check still holds because the
    * persisted centroids define the dimension. */
  val MetaVersion = 2

  /** The one distance the probe ranks by. Persisted so a future
    * metric variant cannot silently probe a cosine-built index. */
  val Metric = "cosine"

  /** Train the coarse quantizer (deterministic bounded sample — the
    * [[SimilaritySearch.ivfTopK]] discipline, same seed ⇒ same cells)
    * and persist centroids + cell-partitioned assignments, plus a
    * `<path>/meta` row carrying the probe contract (metric, vector
    * dimension, nlist) that append/probe re-check fail-fast. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      path: String, nlist: Int = 16, seed: Long = 42,
      maxTrain: Int = 50000): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // the ONE shared training body ([[SimilaritySearch.trainOnSample]]):
    // same inputs ⇒ the index and a live ivfTopK train identical cells
    val centroids = SimilaritySearch.trainOnSample(c, nlist, seed, maxTrain)
    // record centroids.length, NOT the requested nlist (r14 advice):
    // trainOnSample can return fewer cells than requested on a tiny
    // corpus, and checkedCentroids compares the meta against the
    // STORED centroids — recording the request would make a fresh
    // build's own meta violate its contract (and disagree with a
    // rebuildFrom-minted meta, which mints from the centroids)
    Seq((MetaVersion, Metric, centroids.head.length, centroids.length))
      .toDF("version", "metric", "dim", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    centroids.zipWithIndex
      .map { case (ctr, i) => (i, ctr.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    writeAssigned(c, centroids, path, overwrite = true)
  }

  /** Assign a new batch to the EXISTING centroids and append it into
    * their cell directories — no retrain, no rewrite of other cells.
    * A batch whose vectors differ in dimension from the index fails
    * fast per row (the distance would otherwise silently rank on a
    * truncated prefix). */
  def append(batch: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val centroids = checkedCentroids(batch.sparkSession, path)
    val b = batch.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    writeAssigned(b, centroids, path, overwrite = false)
  }

  private def writeAssigned(c: DataFrame, centroids: Array[Array[Double]],
      path: String, overwrite: Boolean): Unit = {
    val dim = centroids.head.length
    val cellUdf = udf { (v: Seq[Double]) =>
      require(v != null && v.length == dim,
        s"vector dim ${if (v == null) "null" else v.length} != index " +
          s"dim $dim (index at $path) — sqDist over mismatched arrays " +
          "would silently rank on a truncated prefix")
      nearestCells(centroids, v, 1).head
    }
    c.withColumn("cell", cellUdf(col("v")))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("cell")
      .parquet(s"$path/assignments")
  }

  /** Read the centroids ONCE, failing fast when the persisted
    * contract does not match this build of the library (metric) or
    * the stored centroids (dim, nlist — a meta/centroids mismatch
    * means the index tree was hand-edited). Legacy indexes without a
    * meta table skip the contract check; callers reuse the returned
    * centroids, so the tiny table is scanned exactly once per
    * operation. */
  private def checkedCentroids(spark: SparkSession,
      path: String): Array[Array[Double]] = {
    val centroids = readCentroids(spark, path)
    readMetaOpt(spark, path).foreach { case (metric, dim, nlist) =>
      require(metric == Metric,
        s"index at $path was built for metric '$metric'; this build " +
          s"ranks by '$Metric'")
      require(centroids.length == nlist &&
          centroids.head.length == dim,
        s"index meta at $path declares dim=$dim nlist=$nlist but the " +
          s"centroids table holds ${centroids.length} cells of dim " +
          s"${centroids.head.length} — the index tree is inconsistent")
    }
    centroids
  }

  /** Migrate a v1 (pre-versioned — no `<path>/meta` directory) index
    * to the current meta version IN PLACE: mint the meta row from the
    * index's own persisted state — the centroids table defines dim and
    * nlist, and `cosine` is the only metric any build of this library
    * has ever ranked by — so the migration writes ONE tiny parquet dir
    * and never touches a vector (the DedupIndex.rebuildFrom
    * pure-file-moves discipline; here not even moves). After it, the
    * legacy index earns the full metric/dim/nlist contract check on
    * every append/probe instead of skipping it forever.
    *
    * Unlike DedupIndex.rebuildFrom there is no stage-then-swap: v1 has
    * NO meta to replace, so the mint is a plain create and the only
    * crash window is a partially-written meta dir. Spark's `_SUCCESS`
    * marker draws that line: a meta dir WITHOUT it is an incomplete
    * mint (readMetaOpt would rightly rethrow on it as corruption) —
    * re-running rebuildFrom clears and re-mints it, since the source
    * of truth (centroids) is never modified. A meta WITH `_SUCCESS`
    * is a live versioned index and is refused — rebuildFrom migrates,
    * it never rewrites. AnnIndexSpec pins migrate → append → probe
    * equality against a fresh build. */
  def rebuildFrom(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    val metaDir = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaDir)) {
      val complete = fs.exists(
        new org.apache.hadoop.fs.Path(metaDir, "_SUCCESS"))
      require(!complete,
        s"index at $path already has a versioned meta — nothing to " +
          "migrate (rebuildFrom never rewrites a live meta)")
      // crashed prior mint: incomplete dir, centroids untouched —
      // clear and re-mint
      fs.delete(metaDir, true)
    }
    val centroids = readCentroids(spark, path)
    Seq((MetaVersion, Metric, centroids.head.length, centroids.length))
      .toDF("version", "metric", "dim", "nlist")
      .coalesce(1).write.mode("overwrite").parquet(metaDir.toString)
  }

  /** v1 (pre-versioned) indexes have NO meta directory → None, checks
    * skipped. Anything else that goes wrong reading an EXISTING meta
    * dir — partial write, empty dir, schema drift — is corruption and
    * rethrows: silently skipping the metric/dim/nlist contract on a
    * present-but-broken meta would downgrade a probe against the wrong
    * index into garbage ranks with no error (r12 advice). The
    * existence probe, not exception-class sniffing, draws the line. */
  private def readMetaOpt(spark: SparkSession,
      path: String): Option[(String, Int, Int)] = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaPath)) None
    else {
      val m = spark.read.parquet(s"$path/meta").head()
      Some((m.getAs[String]("metric"), m.getAs[Int]("dim"),
        m.getAs[Int]("nlist")))
    }
  }

  private def readCentroids(spark: SparkSession,
      path: String): Array[Array[Double]] =
    spark.read.parquet(s"$path/centroids")
      .orderBy("cell")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  private def nearestCells(centroids: Array[Array[Double]],
      v: Seq[Double], n: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (ctr, i) => (i, SimilaritySearch.sqDist(ctr, v.toArray)) }
      .sortBy(_._2).take(n).map(_._1).toSeq

  /** Probe the persisted index: per query, rank ONLY the rows of its
    * `nprobe` nearest cells — the cell predicate is a partition filter,
    * so unprobed cell directories are never read. Returns
    * (query_id, id, cosine, rank), identical to the live
    * [[SimilaritySearch.ivfTopK]] under the same quantizer. */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      qidCol: String, vecCol: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val centroids = checkedCentroids(spark, path)
    require(nprobe >= 1 && nprobe <= centroids.length,
      s"nprobe $nprobe outside [1, nlist=${centroids.length}]")
    val dim = centroids.head.length
    val q = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probeUdf = udf { (qv: Seq[Double]) =>
      require(qv != null && qv.length == dim,
        s"query dim ${if (qv == null) "null" else qv.length} != index " +
          s"dim $dim (index at $path)")
      nearestCells(centroids, qv, nprobe)
    }
    val probed = q.withColumn("cell", explode(probeUdf(col("qv"))))
    // static cell list for the partition filter: the probed set is
    // bounded by |queries|·nprobe ≤ nlist distinct cells — a driver
    // collect over the (small) query side, never over the corpus
    val cells = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val assigned = spark.read.parquet(s"$path/assignments")
      .where(col("cell").isin(cells: _*))
    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", SimilaritySearch.cosine(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }
}
