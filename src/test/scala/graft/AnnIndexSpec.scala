package graft

import graft.operators.{AnnIndex, SimilaritySearch}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted IVF index: probing the built index must equal the live
  * ivfTopK under the same quantizer, the probe scan must read ONLY the
  * probed cell partitions (partition pruning — the point of the disk
  * layout), and appended batches must join their cells without a
  * retrain. */
class AnnIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val queries = emb.where(col("vec_id") < 5)

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("annindex").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("index probe equals live ivfTopK under the shared quantizer, " +
      "and the scan prunes to the probed cells") {
    val path = tmp()
    AnnIndex.build(emb, "vec_id", "embedding", path, nlist = 8)
    val probed = AnnIndex.probe(spark, path, queries,
      "vec_id", "embedding", k = 10, nprobe = 4)
    // same quantizer by construction (trainOnSample is the one shared
    // training body), so results must match row for row
    val live = SimilaritySearch.ivfTopK(emb, queries,
      "vec_id", "embedding", "vec_id", k = 10, nlist = 8, nprobe = 4)
    assert(probed.collect().map(_.toString).sorted.toSeq ==
      live.collect().map(_.toString).sorted.toSeq)
    // partition pruning: the assignments scan carries a cell partition
    // filter — unprobed cell directories are never read
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"no cell partition filter in:\n$plan")
  }

  test("append assigns a new batch to existing cells without retrain") {
    import spark.implicits._
    val path = tmp()
    AnnIndex.build(emb, "vec_id", "embedding", path, nlist = 8)
    // plant a near-copy of vector 3 under a fresh id
    val v3 = emb.where(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    AnnIndex.append(
      Seq((90001L, v3.map(_ + 1e-4))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path)
    val got = AnnIndex.probe(spark, path,
        emb.where(col("vec_id") === 3), "vec_id", "embedding",
        k = 1, nprobe = 1)
      .collect()
    // the appended near-copy lands in vector 3's own cell and wins top-1
    assert(got.length == 1 && got.head.getAs[Long]("id") == 90001L,
      got.mkString(","))
  }

  test("meta persists the probe contract and dimension mismatches " +
      "fail fast instead of ranking on a truncated prefix") {
    import spark.implicits._
    val path = tmp()
    AnnIndex.build(emb, "vec_id", "embedding", path, nlist = 8)
    val dim = emb.select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).length
    // meta round-trips (version, metric, dim, nlist)
    val m = spark.read.parquet(s"$path/meta").head()
    assert(m.getAs[Int]("version") == AnnIndex.MetaVersion)
    assert(m.getAs[String]("metric") == "cosine")
    assert(m.getAs[Int]("dim") == dim)
    assert(m.getAs[Int]("nlist") == 8)
    // a wrong-dimension batch fails the append (udf require surfaces
    // as a SparkException wrapping the IllegalArgumentException)
    val shortVec = Seq.fill(dim - 1)(0.5)
    val ae = intercept[org.apache.spark.SparkException] {
      AnnIndex.append(Seq((90002L, shortVec)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", path)
    }
    assert(ae.getMessage.contains("dim") ||
      Option(ae.getCause).exists(_.getMessage.contains("dim")))
    // a wrong-dimension query fails the probe the same way
    val pe = intercept[org.apache.spark.SparkException] {
      AnnIndex.probe(spark, path,
          Seq((1L, shortVec)).toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 3, nprobe = 2)
        .collect()
    }
    assert(pe.getMessage.contains("dim") ||
      Option(pe.getCause).exists(_.getMessage.contains("dim")))
    // nprobe beyond nlist is a contract violation, not a silent clamp
    val ne = intercept[IllegalArgumentException] {
      AnnIndex.probe(spark, path, queries, "vec_id", "embedding",
        k = 3, nprobe = 99)
    }
    assert(ne.getMessage.contains("nprobe"))
  }

  test("a tiny corpus that trains fewer cells than requested records " +
      "the TRAINED count in meta (r14 advice): the fresh build's own " +
      "meta honors the centroids.length == nlist contract") {
    import spark.implicits._
    val path = tmp()
    // 3 vectors, nlist = 8: trainCentroids caps k at the sample size
    val tiny = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)), (3L, Seq(0.5, 0.5)))
      .toDF("vec_id", "embedding")
    AnnIndex.build(tiny, "vec_id", "embedding", path, nlist = 8)
    val cells = spark.read.parquet(s"$path/centroids").count()
    assert(cells < 8, s"expected fewer than the requested 8, got $cells")
    val m = spark.read.parquet(s"$path/meta").head()
    assert(m.getAs[Int]("nlist").toLong == cells,
      s"meta nlist ${m.getAs[Int]("nlist")} != stored cells $cells")
    // the contract check passes — probe works instead of declaring
    // the index tree inconsistent
    val got = AnnIndex.probe(spark, path,
      Seq((9L, Seq(1.0, 0.1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 2, nprobe = 1).collect()
    assert(got.nonEmpty)
  }

  test("rebuildFrom migrates a v1 (meta-less) index in place: meta " +
      "minted from the persisted centroids, append + probe equal a " +
      "fresh build, crashed mints recover, live metas are refused") {
    val v1 = tmp()
    val fresh = tmp()
    val half = emb.where(col("vec_id") % 2 === 0)
    val rest = emb.where(col("vec_id") % 2 === 1)
    AnnIndex.build(half, "vec_id", "embedding", v1, nlist = 8)
    AnnIndex.build(half, "vec_id", "embedding", fresh, nlist = 8)
    // synthesize a TRUE v1: remove the meta dir entirely (the legacy
    // layout readMetaOpt maps to None)
    val metaDir = new java.io.File(s"$v1/meta")
    metaDir.listFiles.foreach(f => assert(f.delete(), f.toString))
    assert(metaDir.delete())
    AnnIndex.rebuildFrom(spark, v1)
    // the minted meta equals the fresh build's (centroids define
    // dim/nlist; metric has only ever been cosine)
    val minted = spark.read.parquet(s"$v1/meta").head()
    val freshMeta = spark.read.parquet(s"$fresh/meta").head()
    assert(minted == freshMeta, s"$minted != $freshMeta")
    // migration is metadata-only: append + probe equal the fresh
    // build (same deterministic quantizer both sides)
    AnnIndex.append(rest, "vec_id", "embedding", v1)
    AnnIndex.append(rest, "vec_id", "embedding", fresh)
    def probed(p: String) = AnnIndex.probe(spark, p, queries,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(probed(v1) == probed(fresh))
    // crashed mint: a meta dir WITHOUT _SUCCESS is an incomplete
    // write — rebuildFrom clears and re-mints it
    assert(new java.io.File(metaDir, "_SUCCESS").delete())
    AnnIndex.rebuildFrom(spark, v1)
    assert(spark.read.parquet(s"$v1/meta").head() == freshMeta)
    // a live versioned meta is refused — rebuildFrom never rewrites
    val le = intercept[IllegalArgumentException] {
      AnnIndex.rebuildFrom(spark, v1)
    }
    assert(le.getMessage.contains("nothing to migrate"), le.getMessage)
  }

  test("compact merges appended cell files (fewer files, identical " +
      "probes) and a crashed compaction recovers without losing a " +
      "post-crash append") {
    import org.apache.hadoop.fs.Path
    val path = tmp()
    def dataFiles(): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/assignments"))
        .filter(f => !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))
        .map(_.getAbsolutePath)
    }
    AnnIndex.build(emb.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", path, nlist = 8)
    // several small appends — the accumulation shape
    (1 to 3).foreach { r =>
      AnnIndex.append(emb.where(col("vec_id") % 8 === (2 * r - 1)),
        "vec_id", "embedding", path)
    }
    def run() = AnnIndex.probe(spark, path, queries,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    val before = run()
    val filesBefore = dataFiles().size
    AnnIndex.compact(spark, path, targetFiles = 4)
    assert(dataFiles().size < filesBefore,
      s"files $filesBefore -> ${dataFiles().size}")
    assert(run() == before,
      "compaction is pure data movement — probes must not change")
    // crash simulation: a COMPLETE stage (byte-copy of the live cell
    // files + _FILES manifest) that never committed, then an append
    // lands before recovery — recovery must apply the stage (dedup
    // against the manifest) and keep the appended vectors
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dir = new Path(s"$path/assignments")
    val stage = new Path(path, "assignments_compact-crashed")
    fs.mkdirs(stage)
    val rels = fs.listStatus(dir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
      .flatMap { cd =>
        fs.listStatus(cd.getPath)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          .map(f => s"${cd.getPath.getName}/${f.getPath.getName}")
      }.toSeq
    rels.foreach { rel =>
      fs.mkdirs(new Path(stage, rel).getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(dir, rel), fs,
        new Path(stage, rel), false,
        spark.sparkContext.hadoopConfiguration)
    }
    val out = fs.create(new Path(stage, "_FILES"), false)
    out.write(rels.mkString("\n").getBytes("UTF-8")); out.close()
    AnnIndex.append(emb.where(col("vec_id") % 8 === 7),
      "vec_id", "embedding", path)
    AnnIndex.compact(spark, path, targetFiles = 4)
    assert(fs.globStatus(new Path(s"$path/assignments_compact-*")).isEmpty)
    // the full corpus (7 of 8 residues) probes like a fresh build
    val fresh = tmp()
    AnnIndex.build(emb.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", fresh, nlist = 8)
    AnnIndex.append(emb.where(col("vec_id") % 2 === 1),
      "vec_id", "embedding", fresh)
    def probed(p: String) = AnnIndex.probe(spark, p, queries,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(probed(path) == probed(fresh))
  }

  test("compact under the DEFAULT byte planner (targetFiles = 0) — " +
      "the planned path the dedup twin already pins: files collapse " +
      "to the planned count and probes are unchanged") {
    val path = tmp()
    def dataFiles(): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$path/assignments")).count(f =>
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    }
    AnnIndex.build(emb.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", path, nlist = 8)
    (1 to 3).foreach { r =>
      AnnIndex.append(emb.where(col("vec_id") % 8 === (2 * r - 1)),
        "vec_id", "embedding", path)
    }
    def run() = AnnIndex.probe(spark, path, queries,
        "vec_id", "embedding", k = 10, nprobe = 4)
      .collect().map(_.toString).sorted.toSeq
    val before = run()
    val filesBefore = dataFiles()
    AnnIndex.compact(spark, path) // tiny index -> 1 range partition
    assert(dataFiles() < filesBefore && dataFiles() <= 8,
      s"byte-planned compact: $filesBefore -> ${dataFiles()} files " +
        "(at most one per cell from the single planned partition)")
    assert(run() == before,
      "compaction is pure data movement — probes must not change")
  }

  test("the compaction marker makes probes fail fast with a recovery " +
      "hint instead of racing the delete-then-move; the next compact " +
      "clears it") {
    import org.apache.hadoop.fs.Path
    val path = tmp()
    AnnIndex.build(emb, "vec_id", "embedding", path, nlist = 8)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a crashed pass leaves the marker behind
    fs.create(new Path(path,
      graft.operators.DedupIndex.CompactingMarker), false).close()
    val pe = intercept[IllegalArgumentException] {
      AnnIndex.probe(spark, path, queries, "vec_id", "embedding",
        k = 3, nprobe = 2)
    }
    assert(pe.getMessage.contains("compact"), pe.getMessage)
    // the recovering compact owns and clears it
    AnnIndex.compact(spark, path, targetFiles = 4)
    assert(!fs.exists(new Path(path,
      graft.operators.DedupIndex.CompactingMarker)))
    assert(AnnIndex.probe(spark, path, queries, "vec_id", "embedding",
      k = 3, nprobe = 2).collect().nonEmpty)
  }

  test("driftSince scores a batch against the frozen build-time " +
      "moments: exactly 0 on the training corpus, positive on a " +
      "shifted batch, fail-fast without moments / on scale mismatch, " +
      "and freezeMoments repairs a migrated index") {
    val path = tmp()
    AnnIndex.build(emb, "vec_id", "embedding", path, nlist = 8)
    def fd(batch: org.apache.spark.sql.DataFrame): Long =
      AnnIndex.driftSince(spark, path, batch, "embedding")
        .head().getAs[Long]("fd_micro")
    // same rows -> identical integer registers -> exact zero
    assert(fd(emb) == 0L, "the training corpus must score zero drift")
    // a mean shift is exactly what stale centroids look like
    val shifted = emb.select(col("vec_id"),
      transform(col("embedding").cast("array<double>"),
        x => x + lit(3.0)).as("embedding"))
    assert(fd(shifted) > 0L, "a shifted batch must score positive drift")
    // the moments table interops with the streaming scorer (same
    // shape writeReferenceMoments freezes)
    val viaStream = graft.streaming.StreamingEmbedDrift.driftAgainst(
        spark,
        graft.operators.EvalMetrics.vecMoments(
          emb.select(col("embedding").cast("array<double>").as("v")),
          "v"),
        s"$path/moments")
      .head().getAs[Long]("fd_micro")
    assert(viaStream == 0L)
    val se = intercept[IllegalArgumentException] {
      AnnIndex.driftSince(spark, path, emb, "embedding", scale = 512)
    }
    assert(se.getMessage.contains("scale"), se.getMessage)
    // a pre-instrument (or migrated) index names the repair verb
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/moments"), true)
    val me = intercept[IllegalArgumentException] {
      AnnIndex.driftSince(spark, path, emb, "embedding")
    }
    assert(me.getMessage.contains("freezeMoments"), me.getMessage)
    AnnIndex.freezeMoments(spark, path)
    assert(fd(emb) == 0L)
  }

  test("a PRESENT but corrupt meta dir fails the probe loudly; only " +
      "a genuinely absent meta reads as a legacy pre-versioned index") {
    import spark.implicits._
    val path = tmp()
    AnnIndex.build(emb, "vec_id", "embedding", path, nlist = 8)
    // corrupt the meta: empty directory (the partial-write shape).
    // Pre-r13 this silently downgraded to skipping the contract
    // checks; it must now surface as an error, not a lucky probe.
    val metaDir = new java.io.File(s"$path/meta")
    metaDir.listFiles.foreach(_.delete())
    intercept[Exception] {
      AnnIndex.probe(spark, path, queries, "vec_id", "embedding",
        k = 3, nprobe = 2).collect()
    }
    // a legacy index (no meta dir at all) still probes with the
    // checks skipped
    assert(metaDir.listFiles.isEmpty && metaDir.delete(),
      "test setup: could not remove the corrupt meta dir")
    val got = AnnIndex.probe(spark, path, queries, "vec_id",
      "embedding", k = 3, nprobe = 2).collect()
    assert(got.nonEmpty)
  }
}
