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
  * re-[[build]] decision, same as any IVF system — and the index
  * carries its own instrument for making it: [[build]] freezes the
  * training corpus's per-dimension moment registers beside the meta
  * (`<path>/moments` — |dim| rows, deliberately NOT updated by
  * append: they are the build-time distribution), and
  * [[driftSince]] scores any incoming batch against them with the
  * diagonal-Fréchet kernel ([[EvalMetrics.fdFromMoments]]). One
  * |dim|-row aggregation per check, whatever the batch size.
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
    // drift reference LAST, and from the PERSISTED assignments rather
    // than another pass over the corpus frame: same rows, and the
    // corpus plan still executes exactly once (the writeTables
    // discipline). A crash before this line leaves an index without
    // moments — probes work; driftSince fails fast and names
    // freezeMoments as the repair.
    freezeMoments(spark, path)
  }

  /** Default quantization scale for the [[freezeMoments]] registers —
    * [[EvalMetrics.vecMoments]]'s own default, recorded here because
    * the index persists it and [[driftSince]] re-checks it. */
  val MomentScale = 1024

  /** (Re)freeze the index's drift reference: the per-dimension exact
    * integer moment registers (dim, n, s, ss, scale) of everything
    * CURRENTLY in the assignments table — the same table shape
    * [[graft.streaming.StreamingEmbedDrift.writeReferenceMoments]]
    * freezes, so either scorer reads either table. Run it after
    * [[rebuildFrom]] (v1 indexes predate the instrument), or to reset
    * the baseline after a deliberate re-train. Cost: one narrow
    * quantize+posexplode pass over the assignments and a |dim|-row
    * aggregate. */
  def freezeMoments(spark: SparkSession, path: String,
      scale: Int = MomentScale): Unit =
    EvalMetrics.vecMoments(
        spark.read.parquet(s"$path/assignments").select("v"),
        "v", scale)
      .withColumn("scale", lit(scale))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/moments")

  /** Score an incoming batch's embedding distribution against the
    * index's frozen build-time moments: the diagonal-Fréchet distance
    * (one row, the [[EvalMetrics.embedFrechetDiag]] output contract —
    * batch is side A, the index reference side B). THIS is the
    * centroid-drift signal the scaladoc's "re-build decision" needs:
    * ≈ 0 means the batch matches the distribution the quantizer was
    * trained on; a large score means the centroids no longer fit what
    * is being appended and recall under [[probe]] will sag. Cost is
    * one |dim|-row aggregate over the batch — cheap enough to run on
    * every append. Fails fast when the index has no moments table
    * (pre-instrument or migrated index → run [[freezeMoments]]) or
    * when `scale` differs from the frozen one (registers in different
    * units are not comparable). */
  def driftSince(spark: SparkSession, path: String, batch: DataFrame,
      vecCol: String, scale: Int = MomentScale): DataFrame = {
    val momentsPath = new org.apache.hadoop.fs.Path(s"$path/moments")
    val fs = momentsPath.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(momentsPath),
      s"index at $path has no frozen moments — it predates the drift " +
        "instrument (or was migrated): run AnnIndex.freezeMoments to " +
        "establish the reference, then score batches against it")
    val ref = spark.read.parquet(momentsPath.toString)
    val storedScale = ref.select("scale").limit(1).collect().headOption
      .getOrElse(throw new IllegalArgumentException(
        s"moments table at $path is empty — re-run freezeMoments"))
      .getInt(0)
    require(storedScale == scale,
      s"batch quantized at scale=$scale but the index moments were " +
        s"frozen at scale=$storedScale — rebuild one side")
    EvalMetrics.fdFromMoments(
      EvalMetrics.vecMoments(
        batch.select(col(vecCol).cast("array<double>").as("v")),
        "v", scale),
      ref.drop("scale"), scale)
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

  /** The (id, v, cell) frame an index write or an existence check
    * needs: vectors routed to their nearest stored centroid —
    * row-local, centroids ride the closure as a broadcast-sized
    * array. Package-visible for
    * [[graft.streaming.StreamingAnnIngest]], whose idempotent append
    * must assign BEFORE writing (the batch's own cells bound its
    * existence scan). */
  private[graft] def assigned(batch: DataFrame, idCol: String,
      vecCol: String, path: String): DataFrame = {
    val centroids = checkedCentroids(batch.sparkSession, path)
    assignCells(batch.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")), centroids, path)
  }

  /** Additively write a pre-assigned (id, v, cell) frame into the
    * cell directories — the [[append]] tail for callers that already
    * routed (and possibly filtered) the batch. */
  private[graft] def appendAssigned(assignedBatch: DataFrame,
      path: String): Unit =
    assignedBatch.select("id", "v", "cell")
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/assignments")

  private def assignCells(c: DataFrame,
      centroids: Array[Array[Double]], path: String): DataFrame = {
    val dim = centroids.head.length
    val cellUdf = udf { (v: Seq[Double]) =>
      require(v != null && v.length == dim,
        s"vector dim ${if (v == null) "null" else v.length} != index " +
          s"dim $dim (index at $path) — sqDist over mismatched arrays " +
          "would silently rank on a truncated prefix")
      nearestCells(centroids, v, 1).head
    }
    c.withColumn("cell", cellUdf(col("v")))
  }

  private def writeAssigned(c: DataFrame, centroids: Array[Array[Double]],
      path: String, overwrite: Boolean): Unit =
    assignCells(c, centroids, path)
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("cell")
      .parquet(s"$path/assignments")

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

  /** Compact the cell directories: every [[append]] adds one-or-more
    * part files per touched cell, so a continuously-fed index
    * accumulates small files a probe's partition-pruned scan must
    * still enumerate and open — the [[DedupIndex.compact]] small-files
    * cliff at the vector table. Unlike DedupIndex, the assignments
    * table is NOT derived data (it is the only copy of the vectors),
    * so the swap protocol must never hold the data solely in a state
    * it could discard. Protocol — one code path for commit AND crash
    * recovery, correct from every interruption point:
    *
    *  1. finish any crashed compaction (a stage with a `_FILES`
    *     manifest is complete → run step 4 on it; without one it is
    *     incomplete → delete);
    *  2. snapshot the live data files (relative `cell=K/part-...`
    *     paths) — the `_FILES` manifest;
    *  3. read ONLY the manifest's files, range-partition on (cell, id)
    *     to `targetFiles` output partitions, write cell-partitioned to
    *     an `assignments_compact-<uuid>` stage; write `_FILES` LAST
    *     and ATOMICALLY (temp + rename — it is the completion marker
    *     checked by existence, so a partial manifest must be
    *     impossible, not just unlikely);
    *  4. commit = recover: delete whichever manifest files still exist
    *     (their rows live in the stage), MOVE each stage part file
    *     into its live cell directory (additive, the [[append]]
    *     shape), delete the stage.
    *
    * Files appended after a crash are not in the manifest and survive
    * (the stage read is manifest-scoped, so a mid-run append cannot
    * smuggle rows into the stage either); part-file names embed the
    * writing job's UUID, so moved stage files can collide with
    * neither live nor appended files. Like [[DedupIndex.compact]],
    * the pass assumes exclusive access from probes and enforces it
    * fail-fast with the [[DedupIndex.CompactingMarker]]. */
  def compact(spark: SparkSession, path: String,
      targetFiles: Int = 0): Unit = {
    require(targetFiles >= 0,
      s"targetFiles=$targetFiles must be >= 0 (0 = plan from bytes)")
    val dir = new org.apache.hadoop.fs.Path(s"$path/assignments")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // marker up before any mutation, down only on the consistent-tree
    // exits — probes fail fast instead of racing the commit's
    // delete-then-move into a mid-scan FileNotFound (the
    // DedupIndex.CompactingMarker contract; appends stay legal: the
    // stage read is manifest-scoped, so an append's files survive)
    val marker = new org.apache.hadoop.fs.Path(path,
      DedupIndex.CompactingMarker)
    if (!fs.exists(marker)) fs.create(marker, false).close()
    Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$path/assignments_compact-*")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .foreach { st =>
        if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_FILES")))
          commitAssignmentsStage(fs, dir, st.getPath)
        else fs.delete(st.getPath, true)
      }
    val files = listCellFiles(fs, dir)
    if (files.isEmpty) { // fresh recovery left nothing to compact
      fs.delete(marker, false)
      return
    }
    val stage = new org.apache.hadoop.fs.Path(path,
      s"assignments_compact-${java.util.UUID.randomUUID().toString}")
    // file count planned from the SNAPSHOT's real bytes unless pinned
    // (the DedupIndex.compactionFilesFor rationale: a constant makes
    // TB files at 100 TB and collapses the rewrite's parallelism)
    val nFiles =
      if (targetFiles > 0) targetFiles
      else DedupIndex.compactionFilesFor(files.map(rel =>
        fs.getFileStatus(new org.apache.hadoop.fs.Path(dir, rel))
          .getLen).sum)
    // range-partition on (cell, id): each output partition spans few
    // cells, so the partitionBy write produces ~nFiles files total
    // while keeping nFiles-way write parallelism. Read ONLY the
    // manifest's files, never the whole dir (r15 advice): an append
    // landing between the listing and the job's file enumeration
    // would otherwise get its rows into the stage while its file
    // survives the manifest-scoped delete — duplicated vectors. With
    // the read scoped to the snapshot, a mid-run append is tolerated
    // exactly the way the dedup twin tolerates it (not in the
    // manifest → survives untouched). basePath restores the
    // Hive-style `cell` partition column the leaf-file read loses.
    spark.read.option("basePath", dir.toString)
      .parquet(files.map(rel =>
        new org.apache.hadoop.fs.Path(dir, rel).toString): _*)
      .repartitionByRange(nFiles, col("cell"), col("id"))
      .write.partitionBy("cell").parquet(stage.toString)
    // the manifest IS the completion marker, so it must appear
    // atomically: a crash mid-write must never leave a partial
    // manifest recovery would trust (deleting only the LISTED files
    // and renaming the stage in would duplicate every unlisted
    // file's vectors) — write-to-temp + rename, the same
    // rename-as-commit discipline as the stage moves themselves
    // (r15 verdict #2)
    DedupIndex.writeManifest(fs,
      new org.apache.hadoop.fs.Path(stage, "_FILES"), files)
    commitAssignmentsStage(fs, dir, stage)
    fs.delete(marker, false)
  }

  /** Relative `cell=K/<file>` data paths under the assignments dir. */
  private def listCellFiles(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Seq[String] =
    Option(fs.listStatus(dir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap { cd =>
        Option(fs.listStatus(cd.getPath))
          .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => s"${cd.getPath.getName}/${f.getPath.getName}")
      }.toSeq

  /** Commit a COMPLETE assignments stage: delete surviving manifest
    * files, move the stage's part files into the live cell dirs,
    * delete the stage. Idempotent across crashes at any point. */
  private def commitAssignmentsStage(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      stage: org.apache.hadoop.fs.Path): Unit = {
    val manifestPath = new org.apache.hadoop.fs.Path(stage, "_FILES")
    val in = fs.open(manifestPath)
    val manifest = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8").split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
    } finally in.close()
    manifest.foreach { rel =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, rel), false)
    }
    listCellFiles(fs, stage).foreach { rel =>
      val dest = new org.apache.hadoop.fs.Path(dir, rel)
      fs.mkdirs(dest.getParent)
      require(fs.rename(new org.apache.hadoop.fs.Path(stage, rel), dest),
        s"compact: failed to move $rel into $dir")
    }
    fs.delete(stage, true)
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
    val marker = new org.apache.hadoop.fs.Path(path,
      DedupIndex.CompactingMarker)
    require(!marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(marker),
      s"index at $path is mid-compaction (or a compaction crashed): " +
        "a probe would race the commit's delete-then-move. Wait for " +
        "the pass, or re-run AnnIndex.compact to finish crash " +
        "recovery, then probe again.")
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
