package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted

/** A named shingling function: the shingler IDENTITY travels with a
  * persisted [[DedupIndex]] so a probe against an index built with
  * different shingles fails fast instead of silently computing garbage
  * Jaccard (different shingle universes almost never collide, so every
  * similarity would quietly read ~0). Construct via the factories so
  * the id string actually describes the function. */
final case class Shingler(id: String, fn: Column => Column) {
  def apply(c: Column): Column = fn(c)
}

object Shingler {
  /** Word n-gram shingles — the [[Dedup.minhashDupPairs]] default. */
  def word(n: Int = 3): Shingler =
    Shingler(s"word-$n", graft.functions.TextFunctions.wordShingles(_, n))

  /** Character n-gram shingles. */
  def char(n: Int): Shingler =
    Shingler(s"char-$n", graft.functions.TextFunctions.shingles(_, n))
}

/** Persisted MinHash-LSH dedup index: build ONCE over the corpus,
  * probe every incoming crawl batch against it, append accepted
  * batches — the incremental-ingestion shape a continuously-crawled
  * 100 TB corpus needs. [[Dedup.minhashCrossDupPairs]] recomputes the
  * corpus-side shingles, signatures, and band keys on every call,
  * which is right for a one-shot decontamination pass and wrong for a
  * per-batch ingest gate; this operator materializes that work as two
  * plain parquet tables (the [[AnnIndex]] discipline — disk layout IS
  * the index, no binary sidecar format):
  *
  *   <path>/meta    (version, bands, rows_per_band,
  *                   shingler, design_threshold)       — one row
  *   <path>/bands   (id, bh) PARTITIONED BY band       — 8-byte LSH keys
  *   <path>/grams   (id, gram_hashes) PART. BY epoch   — verification sets
  *
  * The bands table is DERIVED from the grams table: each build/append
  * runs the shingler exactly once, stages the hashed gram sets on
  * disk, then reads the staged files back and computes signatures from
  * the stored hashes (minhash is a pure function of the base-hash set
  * — [[Dedup.minhashSigFromHashes]]); the stage commits as a fresh
  * `epoch=<uuid>` grams partition after the bands write.
  * Consequences, both deliberate: the source frame executes once, so
  * nondeterministic inputs can no longer desynchronize the two tables
  * (the r11 caller precondition is gone); and the bands keys are
  * provably consistent with the verification sets because they are
  * computed FROM them.
  *
  * A probe computes the BATCH side's bands fresh (it must — the text
  * is new) and joins them against the stored band keys, then
  * exact-Jaccard verifies candidates against the stored gram-hash sets
  * (Jaccard over injectively-hashed grams equals Jaccard over the
  * grams themselves). Batch sides up to
  * [[DedupIndex.MaxBroadcastBatchDefault]] rows ship as broadcasts and
  * the index side never shuffles; larger (backfill-sized) batches
  * degrade to keyed joins — see [[DedupIndex.probe]].
  *
  * [[DedupIndex.append]] adds a batch's bands + grams WITHOUT touching
  * existing files (additive writes into the partition directories), so
  * ingest is: probe → drop batch rows that hit → append the survivors.
  */
object DedupIndex {

  /** Meta schema version written by [[build]]. v1 indexes (no version
    * column) predate the shingler/threshold contract and are read with
    * the identity checks skipped. */
  val MetaVersion = 2

  /** Batch row count above which [[probe]] stops broadcasting the
    * batch side and degrades to keyed joins. The binding constraint is
    * the gram-set broadcast: a web document holds ~10²–10³ shingles,
    * so 250 k docs ≈ 0.5–2 GB serialized — the upper edge of a sane
    * broadcast (the [[Tokenizer.joinByWord]] sizing argument; its 5 M
    * threshold is per-WORD rows, these are per-DOCUMENT set rows).
    * Overridable per session via `graft.dedupIndex.maxBroadcastBatch`
    * (specs use it to force the keyed path at test scale). */
  val MaxBroadcastBatchDefault: Long = 250000L

  private def maxBroadcastBatch(spark: SparkSession): Long =
    spark.conf.getOption("graft.dedupIndex.maxBroadcastBatch")
      .map(_.toLong).getOrElse(MaxBroadcastBatchDefault)

  /** Build the index over `corpus` at `path` (overwrites). Banding
    * parameters AND the probe contract — shingler identity and the
    * threshold the banding was designed for — are persisted in
    * `<path>/meta` and re-checked on every append/probe.
    *
    * `designThreshold` is the Jaccard level the (bands, rowsPerBand)
    * banding is supposed to catch (pick them together via
    * [[Dedup.lshPlanFor]]); probes BELOW it fail fast because the
    * banding would silently miss pairs the caller asked for. */
  def build(corpus: DataFrame, idCol: String, textCol: String,
      path: String,
      shingler: Shingler = Shingler.word(3),
      bands: Int = 8, rowsPerBand: Int = 4,
      designThreshold: Double = 0.5): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    Seq((MetaVersion, bands, rowsPerBand, shingler.id, designThreshold))
      .toDF("version", "bands", "rows_per_band", "shingler",
        "design_threshold")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    writeTables(corpus, idCol, textCol, path, shingler, bands,
      rowsPerBand, overwrite = true)
  }

  /** Append a new batch into the existing index — additive writes into
    * the partition directories, no rewrite of prior files. Fails fast
    * if `shingler` differs from the build-time one in the index meta. */
  def append(batch: DataFrame, idCol: String, textCol: String,
      path: String,
      shingler: Shingler = Shingler.word(3)): Unit = {
    val meta = readMeta(batch.sparkSession, path)
    // a v1 index stores grams as FLAT part files; appending an
    // epoch=<uuid> partition dir beside them would produce the
    // mixed-depth layout Spark's partition discovery rejects —
    // bricking every subsequent probe. Probing a v1 index still
    // works (flat reads fine); growing one requires a rebuild.
    require(meta.version >= 2,
      s"index at $path has the v1 (pre-epoch) grams layout — " +
        "append would corrupt partition discovery for probes; " +
        "rebuild it with DedupIndex.build")
    meta.requireShingler(shingler, path, "append")
    writeTables(batch, idCol, textCol, path, shingler, meta.bands,
      meta.rowsPerBand, overwrite = false)
  }

  /** Migrate a v1 (pre-epoch) index IN PLACE to the v2 layout, making
    * it growable again: v1 stores grams as FLAT part files, which
    * [[append]] refuses (an epoch dir beside flat files bricks
    * partition discovery — see the require there). The migration is
    * pure FILE MOVES — each flat gram part file renames into one new
    * `grams/epoch=<uuid>` directory — so it costs namenode metadata
    * ops, not a data rewrite, at any index size. The v2 meta
    * (version, shingler identity, design threshold) is written LAST:
    * every intermediate state is either still-v1 (meta untouched;
    * append still refuses, probes of an untouched grams dir still
    * work) or mid-move (re-running rebuildFrom completes it — the
    * file moves are idempotent in aggregate, and a second epoch dir
    * from a re-run is a normal multi-epoch layout).
    *
    * `shingler`/`designThreshold` become the index's persisted
    * contract — a v1 index never recorded them, so the CALLER asserts
    * what the index was built with. Passing the wrong shingler locks
    * in the silently-zero-Jaccard failure mode the v2 meta exists to
    * prevent; there is nothing stored to check it against.
    *
    * The meta rewrite itself follows the writeTables stage-then-swap
    * discipline: the v2 meta is fully written to a `meta_staging-*`
    * dir FIRST, then the old meta deletes and the stage renames into
    * place. A crash in the only unsafe window (between delete and
    * rename) leaves no meta but a completed stage — the next
    * rebuildFrom call detects exactly that state and finishes the
    * swap before anything else, so "re-run completes it" holds for
    * every crash point, not just the file moves. */
  def rebuildFrom(spark: SparkSession, path: String,
      shingler: Shingler = Shingler.word(3),
      designThreshold: Double = 0.5): Unit = {
    import spark.implicits._
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val metaDir = new org.apache.hadoop.fs.Path(s"$path/meta")
    val staged = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$path/meta_staging-*")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
    if (!fs.exists(metaDir)) {
      // a prior run crashed between meta delete and rename: the only
      // state with no meta dir. Complete the swap (a stage is only
      // ever COMPLETE at that point — the delete happens strictly
      // after the staging write returns) and the index is v2.
      val complete = staged.filter(s => fs.exists(
        new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      require(complete.nonEmpty,
        s"index at $path has no meta and no completed meta stage — " +
          "not a crashed rebuildFrom; restore the meta before probing")
      require(fs.rename(complete.head.getPath, metaDir),
        s"rebuildFrom: failed to finish the crashed meta swap at $path")
      staged.diff(complete.take(1))
        .foreach(s => fs.delete(s.getPath, true))
      return
    }
    // stale partial stages from a crash DURING a staging write are
    // invisible to readers (meta still present) — clear them
    staged.foreach(s => fs.delete(s.getPath, true))
    val meta = readMeta(spark, path)
    require(meta.version < 2,
      s"index at $path is already v${meta.version} — nothing to migrate")
    // the flat v1 part files: skip epoch=* dirs (a prior interrupted
    // migration) and _SUCCESS/.-prefixed metadata, which Spark's path
    // filter ignores wherever they sit
    val flat = Option(fs.listStatus(gramsDir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
    if (flat.nonEmpty) {
      val epochDir = new org.apache.hadoop.fs.Path(gramsDir,
        s"epoch=${java.util.UUID.randomUUID().toString}")
      fs.mkdirs(epochDir)
      flat.foreach { st =>
        val dest = new org.apache.hadoop.fs.Path(epochDir,
          st.getPath.getName)
        require(fs.rename(st.getPath, dest),
          s"rebuildFrom: failed to move ${st.getPath} -> $dest")
      }
    }
    val metaStage = new org.apache.hadoop.fs.Path(path,
      s"meta_staging-${java.util.UUID.randomUUID().toString}")
    Seq((MetaVersion, meta.bands, meta.rowsPerBand, shingler.id,
        designThreshold))
      .toDF("version", "bands", "rows_per_band", "shingler",
        "design_threshold")
      .coalesce(1).write.mode("overwrite").parquet(metaStage.toString)
    fs.delete(metaDir, true)
    require(fs.rename(metaStage, metaDir),
      s"rebuildFrom: failed to commit the v2 meta $metaStage -> $metaDir")
  }

  /** Compact the index's accumulated epochs into ONE epoch and rewrite
    * the bands table — the maintenance verb a long-lived index needs:
    * every [[append]] (and every [[graft.streaming.StreamingDedupGate]]
    * micro-batch) commits a fresh `grams/epoch=<uuid>` directory and
    * adds per-partition band files, so a month of ingest is thousands
    * of tiny files every probe must enumerate and read — the classic
    * small-files cliff. This is the engine's counterpart of the
    * reference's Postgres VACUUM/ANALYZE maintenance pass
    * (`01_ingest_raw_telemetry.py:141-167` runs it after every bulk
    * load), including its locking model: like VACUUM FULL, compaction
    * assumes EXCLUSIVE access — no concurrent appends or probes while
    * it runs (crash recovery below is still append-safe: an append
    * that lands between a crash and the recovering call survives,
    * because recovery only ever deletes state it holds a copy of).
    *
    * Protocol (pure data movement — no shingling, no re-hashing; the
    * gram sets and band keys are byte-identical before and after):
    *
    *  1. finish any CRASHED compaction first (see recovery below);
    *  2. snapshot the current epoch list E;
    *  3. read the grams rows of E, coalesce to `targetFiles` files,
    *     and write them to a `grams_compact-<uuid>` stage; the
    *     `_EPOCHS` manifest (the epoch uuids of E, one per line) is
    *     written LAST and is the stage's completion marker;
    *  4. commit: delete each epoch dir in E, then rename the stage to
    *     `grams/epoch=<stage-uuid>`;
    *  5. rebuild the bands table FROM the compacted grams (bands are
    *     derived data — [[writeTables]] computes them from the staged
    *     gram hashes, so a rebuild is always consistent by
    *     construction), staged to `bands_compact-<uuid>` and swapped
    *     in by two renames (bands → `bands_old-<uuid>`, stage →
    *     bands), old dir deleted last.
    *
    * Crash recovery — every interrupted state is completed or
    * discarded by the NEXT compact() call (the [[rebuildFrom]]
    * convention):
    *  - a stage without `_EPOCHS` is incomplete → deleted;
    *  - a stage WITH `_EPOCHS` is a committed-but-unswapped
    *    compaction → recovery deletes whichever manifest epochs still
    *    exist (their rows live in the stage) and renames the stage in;
    *    epochs appended AFTER the crash are not in the manifest and
    *    survive untouched;
    *  - bands stages are always discarded (bands rebuild from grams —
    *    step 5 runs unconditionally);
    *  - a missing bands dir beside a `bands_old-*` dir (a crash
    *    between the two swap renames) restores the old dir so probes
    *    work again until step 5 replaces it.
    *
    * `targetFiles = 0` (default) plans the compacted file count from
    * the table's REAL byte size ([[compactionFilesFor]] — ~256 MB per
    * file), so both the output layout and the rewrite's parallelism
    * scale with the index; pass an explicit count only to pin a test
    * fixture. */
  def compact(spark: SparkSession, path: String,
      targetFiles: Int = 0): Unit = {
    require(targetFiles >= 0,
      s"targetFiles=$targetFiles must be >= 0 (0 = plan from bytes)")
    val meta = readMeta(spark, path)
    require(meta.version >= 2,
      s"index at $path has the v1 (pre-epoch) grams layout — " +
        "migrate with DedupIndex.rebuildFrom before compacting")
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, path)
    val epochs = Option(fs.listStatus(gramsDir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch="))
    require(epochs.nonEmpty,
      s"index at $path has no grams epochs — nothing to compact")
    val stageUuid = java.util.UUID.randomUUID().toString
    val stage = new org.apache.hadoop.fs.Path(path,
      s"grams_compact-$stageUuid")
    // file count planned from the data's REAL size (the semdedupKFor
    // convention — derive the scale knob from the corpus): a constant
    // would produce TB-sized files at a 100 TB index AND collapse the
    // rewrite to that many tasks
    val nGrams =
      if (targetFiles > 0) targetFiles
      else compactionFilesFor(fs.getContentSummary(gramsDir).getLength)
    // coalesce, not repartition: file-count control without shuffling
    // the whole gram volume (rows have no required order or key)
    spark.read.parquet(s"$path/grams")
      .where(col("epoch").isin(epochs.toSeq: _*))
      .select("id", "gram_hashes")
      .coalesce(nGrams)
      .write.parquet(stage.toString)
    writeLines(fs, new org.apache.hadoop.fs.Path(stage, "_EPOCHS"),
      epochs.toSeq)
    commitGramsStage(fs, path, stage)
    rebuildBands(spark, path, meta, targetFiles)
  }

  /** Step 1 of [[compact]]: complete or discard residue of a crashed
    * compaction. Also runs standalone-safe — a no-op on a clean tree. */
  private def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    def glob(pattern: String) =
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(pattern)))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
    glob(s"$path/grams_compact-*").foreach { st =>
      if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_EPOCHS")))
        commitGramsStage(fs, path, st.getPath)
      else fs.delete(st.getPath, true)
    }
    // bands stages are never trusted across a crash — bands rebuild
    // from grams unconditionally, so a stale stage is just disk
    glob(s"$path/bands_compact-*").foreach(s => fs.delete(s.getPath, true))
    val bandsDir = new org.apache.hadoop.fs.Path(s"$path/bands")
    val olds = glob(s"$path/bands_old-*")
    if (!fs.exists(bandsDir) && olds.nonEmpty) {
      // crash between the two swap renames: restore the old bands so
      // the index probes again; the caller's rebuild replaces it
      require(fs.rename(olds.head.getPath, bandsDir),
        s"compact recovery: failed to restore bands at $path")
      olds.drop(1).foreach(s => fs.delete(s.getPath, true))
    } else olds.foreach(s => fs.delete(s.getPath, true))
  }

  /** Commit a COMPLETE grams stage (has `_EPOCHS`): delete whatever
    * manifest epochs still exist — their rows live in the stage — and
    * rename the stage in as one new epoch. Idempotent: a re-run after
    * any crash point finishes the remaining deletes and the rename. */
  private def commitGramsStage(fs: org.apache.hadoop.fs.FileSystem,
      path: String, stage: org.apache.hadoop.fs.Path): Unit = {
    val epochs = readLines(fs,
      new org.apache.hadoop.fs.Path(stage, "_EPOCHS"))
    epochs.foreach { e =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/grams/epoch=$e"),
        true)
    }
    val uuid = stage.getName.stripPrefix("grams_compact-")
    val committed = new org.apache.hadoop.fs.Path(
      s"$path/grams/epoch=$uuid")
    fs.mkdirs(committed.getParent)
    require(fs.rename(stage, committed),
      s"compact: failed to commit grams stage $stage -> $committed")
    // tidy the manifest out of the live epoch (underscore files are
    // invisible to parquet readers — losing this delete is harmless)
    fs.delete(new org.apache.hadoop.fs.Path(committed, "_EPOCHS"), false)
  }

  /** Step 5 of [[compact]]: derive a fresh bands table from the live
    * grams and swap it in. Bands keys are a pure function of the
    * stored gram hashes ([[Dedup.minhashSigFromHashes]]), so the
    * rebuild is provably consistent with the verification sets —
    * which is also why recovery can always discard a bands stage. */
  private def rebuildBands(spark: SparkSession, path: String,
      meta: Meta, targetFiles: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val bandsDir0 = new org.apache.hadoop.fs.Path(s"$path/bands")
    // plan from the CURRENT bands bytes (the rebuild's output is the
    // same rows re-laid-out); fall back to the grams size when bands
    // are missing (a crash between the swap renames with no old dir)
    val nBands =
      if (targetFiles > 0) targetFiles
      else compactionFilesFor(fs.getContentSummary(
        if (fs.exists(bandsDir0)) bandsDir0
        else new org.apache.hadoop.fs.Path(s"$path/grams")).getLength)
    val stage = new org.apache.hadoop.fs.Path(path,
      s"bands_compact-${java.util.UUID.randomUUID().toString}")
    val g = spark.read.parquet(s"$path/grams")
      .select("id", "gram_hashes")
    // range-partition on (band, bh): each output partition spans one
    // or two band values, so the partitionBy write produces
    // ~targetFiles files TOTAL (a hash repartition on `band` alone
    // would collapse parallelism to |bands| tasks; no repartition at
    // all would re-create input-partitions × bands small files — the
    // very problem being compacted away)
    Dedup.bandTriplesFromHashes(g, "id", "gram_hashes", meta.bands,
        meta.rowsPerBand)
      .repartitionByRange(nBands, col("band"), col("bh"))
      .write.partitionBy("band").parquet(stage.toString)
    val bandsDir = new org.apache.hadoop.fs.Path(s"$path/bands")
    val old = new org.apache.hadoop.fs.Path(path,
      s"bands_old-${java.util.UUID.randomUUID().toString}")
    require(fs.rename(bandsDir, old),
      s"compact: failed to retire the old bands at $path")
    require(fs.rename(stage, bandsDir),
      s"compact: failed to commit the new bands at $path")
    fs.delete(old, true)
  }

  /** How many bytes of source data one compacted file should hold —
    * the parquet sweet spot: big enough that footer/rowgroup overhead
    * and open() costs amortize, small enough that one file is one
    * sanely-sized task on read-back. */
  val CompactionFileBytes: Long = 256L * 1024 * 1024

  /** Plan a compacted file count from the data's real byte size:
    * ⌈bytes / [[CompactionFileBytes]]⌉, min 1. Used by [[compact]]
    * (and [[AnnIndex.compact]]) when no explicit count is given — at
    * a 100 TB table this yields ~400 k files and the same rewrite
    * parallelism, where any constant would produce TB-sized files AND
    * collapse the rewrite to that many tasks. */
  def compactionFilesFor(totalBytes: Long): Int = {
    require(totalBytes >= 0, s"totalBytes=$totalBytes must be >= 0")
    ((totalBytes + CompactionFileBytes - 1) / CompactionFileBytes)
      .max(1L).min(Int.MaxValue.toLong).toInt
  }

  private def writeLines(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, lines: Seq[String]): Unit = {
    val out = fs.create(p, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readLines(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, "UTF-8").split("\n").toSeq
        .map(_.trim).filter(_.nonEmpty)
    } finally in.close()
  }

  /** Probe: near-dup pairs (id, batch_id, jaccard) between the indexed
    * corpus and `batch`, jaccard ≥ `threshold` — same candidate
    * generation + exact-verify contract as
    * [[Dedup.minhashCrossDupPairs]], with the corpus side read from
    * the persisted tables instead of recomputed.
    *
    * Fails fast on a shingler mismatch with the index meta, and on
    * `threshold` below the index's design threshold (the persisted
    * banding would silently miss pairs at that level — rebuild with
    * banding planned for the lower threshold instead).
    *
    * Two plans, chosen from the batch's real row count (one cheap
    * count() over the raw batch frame at plan-construction time — the
    * [[Tokenizer.joinByWord]] convention):
    *
    *  - batch ≤ `graft.dedupIndex.maxBroadcastBatch` (a crawl
    *    increment, the common case): the batch's bands, the candidate
    *    ids, and the batch gram sets all ship as broadcasts — the
    *    index side streams through BroadcastHashJoins and NEVER
    *    shuffles, and the returned frame stays lazy;
    *  - larger (backfill-sized) batches: the same dataflow with keyed
    *    joins — the batch shingles persist once (they feed bands and
    *    gram sets), the result is eagerly localCheckpoint-ed and the
    *    cache released before returning (the [[Dedup.minhashDupPairs]]
    *    eagerness contract).
    */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.5,
      shingler: Shingler = Shingler.word(3)): DataFrame = {
    val meta = readMeta(spark, path)
    meta.requireShingler(shingler, path, "probe")
    meta.designThreshold.foreach { t0 =>
      require(threshold >= t0,
        s"probe threshold $threshold is below the index's banding " +
          s"design threshold $t0 (index at $path): the persisted " +
          "bands would silently miss pairs at that similarity. " +
          "Rebuild with banding planned for the lower threshold " +
          "(Dedup.lshPlanFor).")
    }
    if (batch.count() <= maxBroadcastBatch(spark))
      probeBroadcast(spark, path, batch, idCol, textCol, threshold,
        shingler, meta)
    else
      probeKeyed(spark, path, batch, idCol, textCol, threshold,
        shingler, meta)
  }

  /** The crawl-increment plan: batch side computed twice (bands + gram
    * sets) — both passes are over the small side and both ship as
    * broadcasts; the result stays lazy, so there is nothing to
    * pin-and-release here. */
  private def probeBroadcast(spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingler: Shingler, meta: Meta): DataFrame = {
    val bsh = batch
      .select(col(idCol).as("batch_id"), shingler(col(textCol)).as("_sh"))
      .where(size(col("_sh")) > 0)
    val bb = Dedup.bandTriples(bsh, "batch_id", "_sh", meta.bands,
      meta.rowsPerBand)
    val cands = spark.read.parquet(s"$path/bands")
      .join(broadcast(bb), Seq("band", "bh"))
      .select("id", "batch_id")
      .dropDuplicates("id", "batch_id")
    // candidates broadcast back against the grams table: the (large)
    // index side streams through a BroadcastHashJoin — no shuffle
    spark.read.parquet(s"$path/grams").select("id", "gram_hashes")
      .join(broadcast(cands), Seq("id"))
      .join(broadcast(bsh.select(col("batch_id"),
        gramHashes(col("_sh")).as("_bg"))), Seq("batch_id"))
      .withColumn("jaccard", Dedup.jaccard(col("gram_hashes"), col("_bg")))
      .where(col("jaccard") >= threshold)
      .select("id", "batch_id", "jaccard")
  }

  /** The backfill plan: same dataflow, keyed joins. The batch shingle
    * table persists once (it feeds the banding AND the gram sets);
    * the verified-pair result — small by construction — is eagerly
    * materialized so the cache can be released before returning. */
  private def probeKeyed(spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingler: Shingler, meta: Meta): DataFrame = {
    val bsh = batch
      .select(col(idCol).as("batch_id"), shingler(col(textCol)).as("_sh"))
      .where(size(col("_sh")) > 0)
      .persistTracked
    try {
      val bb = Dedup.bandTriples(bsh, "batch_id", "_sh", meta.bands,
        meta.rowsPerBand)
      val cands = spark.read.parquet(s"$path/bands")
        .join(bb, Seq("band", "bh"))
        .select("id", "batch_id")
        .dropDuplicates("id", "batch_id")
      val verified = spark.read.parquet(s"$path/grams")
        .select("id", "gram_hashes")
        .join(cands, Seq("id"))
        .join(bsh.select(col("batch_id"),
          gramHashes(col("_sh")).as("_bg")), Seq("batch_id"))
        .withColumn("jaccard",
          Dedup.jaccard(col("gram_hashes"), col("_bg")))
        .where(col("jaccard") >= threshold)
        .select("id", "batch_id", "jaccard")
      verified.localCheckpoint()
    } finally bsh.unpersist(false)
  }

  /** ONE pass over the source: shingle → hash → gram sets, written to
    * a dot-prefixed STAGING directory (invisible to parquet readers);
    * the bands rows are then computed FROM the staged files and the
    * grams epoch is committed LAST by an atomic directory rename into
    * `grams/epoch=<uuid>`. Two properties, both load-bearing:
    *
    *  - the source frame executes exactly once, so the bands keys are
    *    derived from — and provably consistent with — the verification
    *    sets, and nondeterministic inputs cannot desynchronize them;
    *  - grams-commit-last preserves [[graft.streaming.StreamingDedupGate]]'s
    *    crash-residual contract: a crash mid-append can leave band rows
    *    without grams rows (harmless — probe dedups candidates, and a
    *    replayed append re-writes both), never grams without bands,
    *    which would duplicate probe pairs after a replay. A crash
    *    before the bands write leaks only a staging dir probes never
    *    read (glob-cleared by the next overwrite build). */
  private def writeTables(df: DataFrame, idCol: String, textCol: String,
      path: String, shingler: Shingler, bands: Int,
      rowsPerBand: Int, overwrite: Boolean): Unit = {
    val spark = df.sparkSession
    val mode = if (overwrite) "overwrite" else "append"
    val epoch = java.util.UUID.randomUUID().toString
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (overwrite) {
      fs.delete(gramsDir, true)
      // also clear any crash-leaked staging dirs from prior appends
      // and compactions — a rebuild supersedes every stage
      Seq("grams_staging-*", "grams_compact-*", "bands_compact-*",
          "bands_old-*").foreach { pat =>
        val stale = fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$path/$pat"))
        if (stale != null) stale.foreach(s => fs.delete(s.getPath, true))
      }
    }
    // staging lives BESIDE grams (probes read only <path>/grams, so
    // the stage is invisible by path): a dot-prefixed dir inside grams
    // would also work but trips Spark's hidden-path listing warning on
    // every read-back, polluting the bench tail
    val staging = new org.apache.hadoop.fs.Path(path,
      s"grams_staging-$epoch")
    df.select(col(idCol).as("id"), shingler(col(textCol)).as("_sh"))
      .where(size(col("_sh")) > 0)
      .select(col("id"), gramHashes(col("_sh")).as("gram_hashes"))
      .write.mode("overwrite").parquet(staging.toString)
    val g = spark.read.parquet(staging.toString)
    Dedup.bandTriplesFromHashes(g, "id", "gram_hashes", bands,
      rowsPerBand)
      .write.mode(mode).partitionBy("band").parquet(s"$path/bands")
    val committed = new org.apache.hadoop.fs.Path(gramsDir,
      s"epoch=$epoch")
    fs.mkdirs(gramsDir) // first build: the parent must exist to rename into
    require(fs.rename(staging, committed),
      s"failed to commit grams epoch $staging -> $committed")
  }

  /** Distinct 64-bit shingle hashes — the stored verification set.
    * Jaccard over these equals Jaccard over the shingle strings as
    * long as the hash is injective on the corpus vocabulary (64-bit
    * murmur over ≤ 10⁹ distinct shingles: collision odds ≈ 3·10⁻²,
    * and ONE collision perturbs one set's size by one element). */
  private val gramHashes = udf((sh: Seq[String]) =>
    sh.map(Dedup.hash64).distinct.sorted)

  private case class Meta(version: Int, bands: Int, rowsPerBand: Int,
      shingler: Option[String], designThreshold: Option[Double]) {
    def requireShingler(s: Shingler, path: String, op: String): Unit =
      shingler.foreach { s0 =>
        require(s0 == s.id,
          s"$op called with shingler '${s.id}' against the index at " +
            s"$path, which was built with shingler '$s0' — the shingle " +
            "universes differ, so every Jaccard would silently read ~0. " +
            "Pass the build-time shingler (or rebuild).")
      }
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val df = spark.read.parquet(s"$path/meta")
    val m = df.head()
    val has = df.columns.toSet
    Meta(
      if (has("version")) m.getAs[Int]("version") else 1,
      m.getAs[Int]("bands"), m.getAs[Int]("rows_per_band"),
      if (has("shingler")) Some(m.getAs[String]("shingler")) else None,
      if (has("design_threshold"))
        Some(m.getAs[Double]("design_threshold"))
      else None)
  }
}
