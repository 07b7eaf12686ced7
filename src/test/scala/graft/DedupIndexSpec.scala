package graft

import graft.operators.{Dedup, DedupIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted MinHash dedup index: probing the built index must equal
  * the live cross-corpus pair generator on the same inputs, appends
  * must feed candidates without a rebuild, and the probe plan must not
  * shuffle the index side. */
class DedupIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val docs = graft.Tables.documents(spark, sf)
    .select("doc_id", "text").where(col("text").isNotNull)

  private def tmp(): String = {
    val d = java.nio.file.Files.createTempDirectory("dedupindex").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def batch() = docs.where(col("doc_id") % 5 === 0)
    .select((col("doc_id") + 300000L).as("doc_id"),
      concat(col("text"), lit(" crawl extra tail")).as("text"))

  test("index probe equals the live minhashCrossDupPairs on the same " +
      "corpus and batch") {
    val path = tmp()
    DedupIndex.build(docs, "doc_id", "text", path)
    val probed = DedupIndex.probe(spark, path, batch(),
        "doc_id", "text", threshold = 0.5)
      .select(col("id"), col("batch_id"),
        round(col("jaccard"), 9).as("j")).collect()
      .map(_.toString).sorted.toSeq
    val live = Dedup.minhashCrossDupPairs(docs, batch(),
        "doc_id", "text", threshold = 0.5)
      .select(col("id"), col("ref_id"),
        round(col("jaccard"), 9).as("j")).collect()
      .map(_.toString).sorted.toSeq
    assert(probed.nonEmpty, "planted near-dups must be found")
    assert(probed == live)
  }

  test("append feeds probe candidates exactly like build") {
    val path = tmp()
    val whole = tmp()
    DedupIndex.build(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", path)
    DedupIndex.append(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", path)
    DedupIndex.build(docs, "doc_id", "text", whole)
    def run(p: String) = DedupIndex.probe(spark, p, batch(),
        "doc_id", "text", threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    assert(run(path) == run(whole))
  }

  test("probe plan: index tables never shuffle — the only Exchange is " +
      "the candidate-sized dedup, and the bands scan is " +
      "dynamically partition-pruned") {
    val path = tmp()
    DedupIndex.build(docs, "doc_id", "text", path)
    val plan = DedupIndex.probe(spark, path, batch(), "doc_id", "text")
      .queryExecution.executedPlan.toString
    // every index-side join is a BroadcastHashJoin (stored tables
    // stream); the single hash exchange is the (id, batch_id)
    // candidate dedup, which is candidate-sized by construction
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges == 1, s"expected only the candidate-dedup " +
      s"exchange, got $exchanges in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"index-side sort-merge join in probe plan:\n$plan")
    // the batch's band keys prune the band partition directories
    assert(plan.contains("dynamicpruningexpression(band"),
      s"no dynamic partition pruning on the bands scan:\n$plan")
  }

  test("lshPlanFor picks the cheapest factorization meeting the " +
      "recall budget — the 16x2 rationale, hand-verified") {
    // hand-computed S-curve values: catch(s, b, r) = 1 - (1 - s^r)^b
    val c84 = Dedup.lshCatchProbability(0.69, 8, 4)
    assert(math.abs(c84 - (1 - math.pow(1 - math.pow(0.69, 4), 8)))
      < 1e-12)
    assert(c84 > 0.85 && c84 < 0.90, s"8x4 at j=0.69: $c84") // ~13% miss
    val c162 = Dedup.lshCatchProbability(0.69, 16, 2)
    assert(c162 > 0.9999, s"16x2 at j=0.69: $c162")
    // at threshold 0.69 and 32 hashes, 16x2 is the fewest-bands plan
    // meeting 0.999; at threshold 0.95 a cheaper 8x4 already qualifies
    assert(Dedup.lshPlanFor(0.69, 32) == Some((16, 2)))
    assert(Dedup.lshPlanFor(0.95, 32) == Some((8, 4)))
    // unreachable budget -> None (raise numHashes)
    assert(Dedup.lshPlanFor(0.2, 4, minCatch = 0.9999).isEmpty)
  }

  test("probe and append fail fast on a shingler mismatch with the " +
      "index meta — never silently compute cross-universe Jaccard") {
    import graft.operators.Shingler
    val path = tmp()
    DedupIndex.build(docs.limit(10), "doc_id", "text", path,
      shingler = Shingler.word(3))
    // meta persists the shingler identity
    val m = spark.read.parquet(s"$path/meta").head()
    assert(m.getAs[String]("shingler") == "word-3")
    assert(m.getAs[Int]("version") == DedupIndex.MetaVersion)
    val pe = intercept[IllegalArgumentException] {
      DedupIndex.probe(spark, path, batch(), "doc_id", "text",
        threshold = 0.5, shingler = Shingler.char(4))
    }
    assert(pe.getMessage.contains("char-4") &&
      pe.getMessage.contains("word-3"))
    val ae = intercept[IllegalArgumentException] {
      DedupIndex.append(batch(), "doc_id", "text", path,
        shingler = Shingler.char(4))
    }
    assert(ae.getMessage.contains("shingler"))
    // the matching shingler still probes fine
    assert(DedupIndex.probe(spark, path, docs.limit(10), "doc_id",
      "text", threshold = 0.99).count() == 10)
  }

  test("append refuses a legacy v1 index (flat grams layout) — an " +
      "epoch dir beside flat part files would brick partition " +
      "discovery for every later probe") {
    import spark.implicits._
    val path = tmp()
    DedupIndex.build(docs.limit(10), "doc_id", "text", path)
    // regress the meta to the v1 schema (bands/rows only, no version)
    Seq((8, 4)).toDF("bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val e = intercept[IllegalArgumentException] {
      DedupIndex.append(batch(), "doc_id", "text", path)
    }
    assert(e.getMessage.contains("v1"))
    // probing a v1-meta index still works (reads are layout-agnostic)
    assert(DedupIndex.probe(spark, path, docs.limit(10),
      "doc_id", "text", threshold = 0.99).count() == 10)
  }

  test("rebuildFrom migrates a synthesized v1 index to the v2 epoch " +
      "layout — append + probe green afterwards, pairs equal a fresh " +
      "v2 build") {
    import spark.implicits._
    val path = tmp()
    val fresh = tmp()
    val half = docs.where(col("doc_id") % 2 === 0)
    val rest = docs.where(col("doc_id") % 2 === 1)
    // synthesize a TRUE v1 index: build v2, then flatten the grams
    // epoch dir into flat part files and regress the meta schema
    DedupIndex.build(half, "doc_id", "text", path)
    val gramsRows = spark.read.parquet(s"$path/grams")
      .select("id", "gram_hashes")
    val flatTmp = tmp() + "/flatgrams"
    gramsRows.write.parquet(flatTmp)
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(gramsDir, true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(flatTmp), gramsDir))
    Seq((8, 4)).toDF("bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // v1 state: append refuses, probe works
    intercept[IllegalArgumentException] {
      DedupIndex.append(rest, "doc_id", "text", path)
    }
    // migrate, then grow: append the other half and probe
    DedupIndex.rebuildFrom(spark, path, designThreshold = 0.5)
    val m = spark.read.parquet(s"$path/meta").head()
    assert(m.getAs[Int]("version") == DedupIndex.MetaVersion)
    assert(m.getAs[String]("shingler") == "word-3")
    assert(m.getAs[Double]("design_threshold") == 0.5)
    DedupIndex.append(rest, "doc_id", "text", path)
    DedupIndex.build(docs, "doc_id", "text", fresh)
    def run(p: String) = DedupIndex.probe(spark, p, batch(),
        "doc_id", "text", threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    val migrated = run(path)
    assert(migrated.nonEmpty && migrated == run(fresh),
      "migrated+appended index must probe exactly like a fresh build")
    // idempotent re-entry: a v2 index refuses a second migration
    val e = intercept[IllegalArgumentException] {
      DedupIndex.rebuildFrom(spark, path)
    }
    assert(e.getMessage.contains("already"))
  }

  test("rebuildFrom completes an INTERRUPTED migration on re-run: a " +
      "crash that moved only some flat files leaves a state the next " +
      "run finishes (second epoch dir = normal multi-epoch layout)") {
    import spark.implicits._
    val path = tmp()
    val fresh = tmp()
    DedupIndex.build(docs, "doc_id", "text", path)
    // flatten to v1 (same synthesis as the happy-path test)
    val flatTmp = tmp() + "/flatgrams"
    // 2 part files, so the "crash" can strand one moved + one flat
    spark.read.parquet(s"$path/grams").select("id", "gram_hashes")
      .repartition(2).write.parquet(flatTmp)
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(gramsDir, true)
    assert(fs.rename(new org.apache.hadoop.fs.Path(flatTmp), gramsDir))
    Seq((8, 4)).toDF("bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // simulate the crash: move ONE flat part file into an epoch dir
    // by hand (as rebuildFrom would), leave the rest flat, meta v1
    val flat = fs.listStatus(gramsDir).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") &&
      !s.getPath.getName.startsWith("."))
    assert(flat.length >= 2,
      "fixture needs >= 2 flat part files to interrupt between")
    val crashedEpoch = new org.apache.hadoop.fs.Path(gramsDir,
      "epoch=crashed-run")
    fs.mkdirs(crashedEpoch)
    assert(fs.rename(flat.head.getPath,
      new org.apache.hadoop.fs.Path(crashedEpoch,
        flat.head.getPath.getName)))
    // re-run: moves the REMAINING flat files, writes meta v2
    DedupIndex.rebuildFrom(spark, path)
    assert(spark.read.parquet(s"$path/meta").head()
      .getAs[Int]("version") == DedupIndex.MetaVersion)
    DedupIndex.build(docs, "doc_id", "text", fresh)
    def run(p: String) = DedupIndex.probe(spark, p, batch(),
        "doc_id", "text", threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    val recovered = run(path)
    assert(recovered.nonEmpty && recovered == run(fresh),
      "the recovered two-epoch index must probe exactly like a fresh " +
        "build")
  }

  test("rebuildFrom survives a crash in the meta swap itself: no meta " +
      "+ a completed stage is finished by the next run; stale partial " +
      "stages are cleared while the meta is intact") {
    import spark.implicits._
    val path = tmp()
    DedupIndex.build(docs.limit(20), "doc_id", "text", path)
    // regress to v1 meta then migrate normally
    Seq((8, 4)).toDF("bands", "rows_per_band")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    DedupIndex.rebuildFrom(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash WINDOW: stage fully written (copy the live
    // meta), old meta deleted, rename never happened
    val stage = new org.apache.hadoop.fs.Path(path,
      "meta_staging-crashed")
    fs.mkdirs(stage)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/meta"))
      .foreach { st =>
        org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
          new org.apache.hadoop.fs.Path(stage, st.getPath.getName),
          false, spark.sparkContext.hadoopConfiguration)
      }
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    // a probe in this state fails (no meta) — the documented recovery
    // is re-running rebuildFrom, which must finish the swap
    DedupIndex.rebuildFrom(spark, path)
    val m = spark.read.parquet(s"$path/meta").head()
    assert(m.getAs[Int]("version") == DedupIndex.MetaVersion)
    assert(DedupIndex.probe(spark, path, batch(), "doc_id", "text",
      threshold = 0.5).collect() != null)
    // and with the meta INTACT, a leftover partial stage (no _SUCCESS)
    // is cleared, not promoted
    val partial = new org.apache.hadoop.fs.Path(path,
      "meta_staging-partial")
    fs.mkdirs(partial)
    intercept[IllegalArgumentException] {
      DedupIndex.rebuildFrom(spark, path) // already v2 -> refuses
    }
    assert(!fs.exists(partial),
      "a stale partial stage must be cleared while meta is present")
  }

  private def epochDirs(path: String): Seq[String] = {
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(gramsDir)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName).toSeq
  }

  private def dataFileCount(path: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path)).count(f =>
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  test("compact merges many appended epochs into one, shrinks the " +
      "file count, keeps probes byte-identical, and the index still " +
      "grows afterwards") {
    val path = tmp()
    val fresh = tmp()
    DedupIndex.build(docs.where(col("doc_id") % 2 === 0),
      "doc_id", "text", path)
    // five tiny appends — the per-micro-batch streaming-gate shape
    Seq(1, 3, 5, 7, 9).foreach { r =>
      DedupIndex.append(docs.where(col("doc_id") % 10 === r),
        "doc_id", "text", path)
    }
    assert(epochDirs(path).size == 6)
    def run(p: String) = DedupIndex.probe(spark, p, batch(),
        "doc_id", "text", threshold = 0.5)
      .select(col("id"), col("batch_id"),
        round(col("jaccard"), 9).as("j")).collect()
      .map(_.toString).sorted.toSeq
    val before = run(path)
    val gramsFilesBefore = dataFileCount(s"$path/grams")
    val bandsFilesBefore = dataFileCount(s"$path/bands")
    DedupIndex.compact(spark, path, targetFiles = 2)
    assert(epochDirs(path).size == 1, "epochs must merge to one")
    assert(dataFileCount(s"$path/grams") < gramsFilesBefore &&
      dataFileCount(s"$path/grams") <= 2,
      s"grams files $gramsFilesBefore -> ${dataFileCount(s"$path/grams")}")
    assert(dataFileCount(s"$path/bands") < bandsFilesBefore,
      s"bands files $bandsFilesBefore -> ${dataFileCount(s"$path/bands")}")
    assert(run(path) == before,
      "compaction is pure data movement — probes must not change")
    // the compacted index still grows: append the batch itself, then
    // a self-probe of it must hit at jaccard 1.0
    DedupIndex.build(docs, "doc_id", "text", fresh)
    assert(run(path) == run(fresh))
    DedupIndex.append(batch(), "doc_id", "text", path)
    assert(DedupIndex.probe(spark, path, batch(), "doc_id", "text",
        threshold = 0.99)
      .where(col("id") === col("batch_id")).count() == batch().count())
  }

  test("compactionFilesFor plans the rewrite from real bytes: ~256 MB " +
      "per file, min 1, scaling files AND rewrite parallelism with " +
      "the index") {
    val mb = 1024L * 1024
    assert(DedupIndex.compactionFilesFor(0L) == 1)
    assert(DedupIndex.compactionFilesFor(1L) == 1)
    assert(DedupIndex.compactionFilesFor(256 * mb) == 1)
    assert(DedupIndex.compactionFilesFor(256 * mb + 1) == 2)
    // 100 TB -> ~400k files / 400k-way rewrite, where any constant
    // would mean TB-sized files and a handful of tasks
    assert(DedupIndex.compactionFilesFor(100L * 1024 * 1024 * mb)
      == 409600)
    intercept[IllegalArgumentException] {
      DedupIndex.compactionFilesFor(-1L)
    }
    // the default (targetFiles = 0) path actually engages the planner
    val path = tmp()
    DedupIndex.build(docs.limit(50), "doc_id", "text", path)
    DedupIndex.append(docs.limit(100).where(col("doc_id") % 2 === 1),
      "doc_id", "text", path)
    DedupIndex.compact(spark, path) // tiny index -> 1 grams file
    assert(epochDirs(path).size == 1)
    assert(dataFileCount(s"$path/grams") == 1,
      s"tiny index must compact to one file, got " +
        s"${dataFileCount(s"$path/grams")}")
  }

  test("interrupted compaction recovers at every crash point, " +
      "including with an append landing between crash and recovery") {
    import org.apache.hadoop.fs.Path
    val path = tmp()
    val fresh = tmp()
    val evens = docs.where(col("doc_id") % 2 === 0)
    DedupIndex.build(evens.where(col("doc_id") % 4 === 0),
      "doc_id", "text", path)
    DedupIndex.append(evens.where(col("doc_id") % 4 === 2),
      "doc_id", "text", path)
    val fs = new Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // crash state A: a COMPLETE stage (data + _EPOCHS manifest) with
    // the manifest epochs still live (crash before any delete), plus
    // an INCOMPLETE stage (no manifest) from an earlier attempt
    val epochs = epochDirs(path).map(_.stripPrefix("epoch="))
    val stage = new Path(path, "grams_compact-crashA")
    spark.read.parquet(s"$path/grams").select("id", "gram_hashes")
      .coalesce(1).write.parquet(stage.toString)
    val out = fs.create(new Path(stage, "_EPOCHS"), false)
    out.write(epochs.mkString("\n").getBytes("UTF-8")); out.close()
    fs.mkdirs(new Path(path, "grams_compact-incomplete"))
    // an append lands AFTER the crash, BEFORE recovery — its epoch is
    // not in the manifest and must survive the recovering compact
    DedupIndex.append(docs.where(col("doc_id") % 2 === 1),
      "doc_id", "text", path)
    DedupIndex.compact(spark, path)
    assert(epochDirs(path).size == 1)
    assert(fs.globStatus(new Path(s"$path/grams_compact-*")).isEmpty)
    def run(p: String) = DedupIndex.probe(spark, p, batch(),
        "doc_id", "text", threshold = 0.5)
      .select(col("id"), col("batch_id"),
        round(col("jaccard"), 9).as("j")).collect()
      .map(_.toString).sorted.toSeq
    DedupIndex.build(docs, "doc_id", "text", fresh)
    assert(run(path).nonEmpty && run(path) == run(fresh),
      "recovered + appended index must probe exactly like a fresh build")
    // crash state B: the bands swap died between its two renames —
    // bands gone, bands_old present; the next compact restores and
    // then rebuilds
    val bandsDir = new Path(s"$path/bands")
    assert(fs.rename(bandsDir, new Path(path, "bands_old-crashB")))
    DedupIndex.compact(spark, path)
    assert(fs.exists(bandsDir) &&
      fs.globStatus(new Path(s"$path/bands_old-*")).isEmpty)
    assert(run(path) == run(fresh))
  }

  test("probe fails fast below the index's banding design threshold") {
    val path = tmp()
    DedupIndex.build(docs.limit(10), "doc_id", "text", path,
      designThreshold = 0.5)
    val e = intercept[IllegalArgumentException] {
      DedupIndex.probe(spark, path, batch(), "doc_id", "text",
        threshold = 0.3)
    }
    assert(e.getMessage.contains("design threshold"))
  }

  test("the keyed (backfill-sized batch) probe path equals the " +
      "broadcast path row for row") {
    val path = tmp()
    DedupIndex.build(docs, "doc_id", "text", path)
    def run() = DedupIndex.probe(spark, path, batch(),
        "doc_id", "text", threshold = 0.5)
      .select(col("id"), col("batch_id"),
        round(col("jaccard"), 9).as("j")).collect()
      .map(_.toString).sorted.toSeq
    val viaBroadcast = run()
    val viaKeyed =
      try {
        spark.conf.set("graft.dedupIndex.maxBroadcastBatch", "1")
        // the keyed path returns an eagerly-checkpointed frame — proof
        // the fallback was actually taken (the broadcast path is lazy)
        val kf = DedupIndex.probe(spark, path, batch(),
          "doc_id", "text", threshold = 0.5)
        assert(kf.queryExecution.logical.toString.contains("LogicalRDD"),
          "keyed fallback not taken under maxBroadcastBatch=1")
        run()
      } finally spark.conf.unset("graft.dedupIndex.maxBroadcastBatch")
    assert(viaBroadcast.nonEmpty && viaKeyed == viaBroadcast)
  }

  test("probe reads the build-time banding params from the index meta") {
    val path = tmp()
    DedupIndex.build(docs.limit(10), "doc_id", "text", path,
      bands = 4, rowsPerBand = 8)
    // meta round-trips the build-time banding parameters
    val m = spark.read.parquet(s"$path/meta").head()
    assert(m.getAs[Int]("bands") == 4 && m.getAs[Int]("rows_per_band") == 8)
    // probe picks them up: signatures still line up with the index
    val got = DedupIndex.probe(spark, path, docs.limit(10),
      "doc_id", "text", threshold = 0.99)
    // every doc matches itself at jaccard 1.0
    assert(got.where(col("id") === col("batch_id")).count() == 10)
  }
}
