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
  *   <path>/bands   (id, bh) PART. BY epoch, band      — 8-byte LSH keys
  *   <path>/grams   (id, gram_hashes) PART. BY epoch   — verification sets
  *
  * BOTH tables are epoch-partitioned (v3, the tiered-compaction
  * layout): every build/append commits one `epoch=<uuid>` unit in each
  * table, with matching uuids — the invariant that lets maintenance
  * retire an epoch's band rows by deleting ONE directory, which is
  * what makes PARTIAL (tiered) compaction possible at all. A bands
  * epoch with no grams twin is always crash residue (grams commit
  * last), never live data.
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

  /** Meta schema version written by [[build]].
    *  - v1 (no version column): flat grams part files — probes work,
    *    growth requires [[rebuildFrom]].
    *  - v2: epoch-partitioned grams, bands partitioned by band only —
    *    growable, but band rows cannot be retired per epoch, so only
    *    full-rewrite compaction is possible; [[rebuildFrom]] migrates.
    *  - v3: bands partitioned by (epoch, band) with uuids matching the
    *    grams epochs — tiered [[compact]] works. */
  val MetaVersion = 3

  /** LEGACY marker file a pre-generation [[AnnIndex]] compaction left
    * at its index root: that protocol moved the only copy of the
    * vectors in place, so probes had to fail fast on the marker.
    * Since the generation-versioned ANN layout (r17), BOTH indexes
    * serve through maintenance — retirement is a marker, commits are
    * renames, [[vacuum]]'s grace covers long-running readers — and
    * the marker is consulted only when probing an un-migrated legacy
    * ANN tree ([[AnnIndex.rebuildFrom]] migrates). Lives here because
    * the manifest/recovery protocol this file defines is what both
    * compactors share. */
  val CompactingMarker = "_COMPACTING"

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
    // bricking every subsequent probe. A v2 index has flat
    // band=<k> bands dirs, which an epoch-tagged bands write would
    // brick the same way. Probing either still works (reads are
    // layout-agnostic); growing one requires [[rebuildFrom]].
    require(meta.version >= 3,
      s"index at $path has the v${meta.version} " +
        s"(${if (meta.version < 2) "pre-epoch grams" else "pre-epoch bands"}) " +
        "layout — append would corrupt partition discovery for " +
        "probes; migrate it with DedupIndex.rebuildFrom")
    meta.requireShingler(shingler, path, "append")
    writeTables(batch, idCol, textCol, path, shingler, meta.bands,
      meta.rowsPerBand, overwrite = false)
  }

  /** Migrate a v1 or v2 index IN PLACE to the v3 layout, making it
    * growable (v1) and tiered-compactable (both) again.
    *
    * v1 → v3 is pure FILE MOVES — the flat gram part files rename into
    * ONE new `grams/epoch=<uuid>` directory and the flat `band=<k>`
    * bands dirs rename under `bands/epoch=<uuid>/` with the SAME uuid
    * (v1 data is one logical epoch; matching uuids are the tiered-
    * compaction invariant) — so it costs namenode metadata ops, not a
    * data rewrite, at any index size. A re-run after a crash reuses
    * the existing epoch dir and finishes the remaining moves, so every
    * row's grams and bands land under the one shared epoch.
    *
    * v2 → v3 rebuilds the BANDS table only: v2 band files mix rows
    * from every epoch, so they cannot be split by moves — but bands
    * are derived data (a pure function of the stored gram hashes, the
    * [[compact]] argument), so the migration recomputes them FROM the
    * epoch-partitioned grams, carrying each row's own epoch, in one
    * job staged to `bands_migrate-<uuid>` and swapped in by two
    * renames. The grams (the data) are never touched. A v2 meta
    * already carries the shingler/threshold contract, which is carried
    * forward unchanged — the `shingler`/`designThreshold` arguments
    * only apply to v1 indexes, which never recorded them, so the
    * CALLER asserts what the index was built with (passing the wrong
    * shingler locks in the silently-zero-Jaccard failure mode the meta
    * exists to prevent; there is nothing stored to check it against).
    *
    * The meta rewrite itself follows the writeTables stage-then-swap
    * discipline: the v3 meta is fully written to a `meta_staging-*`
    * dir FIRST, then the old meta deletes and the stage renames into
    * place. A crash in the only unsafe window (between delete and
    * rename) leaves no meta but a completed stage — the next
    * rebuildFrom call detects exactly that state and finishes the
    * swap before anything else, so "re-run completes it" holds for
    * every crash point, not just the file moves. */
  def rebuildFrom(spark: SparkSession, path: String,
      shingler: Shingler = Shingler.word(3),
      designThreshold: Double = 0.5): Unit = {
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def glob(pattern: String) =
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(pattern)))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
    val metaDir = new org.apache.hadoop.fs.Path(s"$path/meta")
    val staged = glob(s"$path/meta_staging-*")
    if (!fs.exists(metaDir)) {
      // a prior run crashed between meta delete and rename: the only
      // state with no meta dir. Complete the swap (a stage is only
      // ever COMPLETE at that point — the delete happens strictly
      // after the staging write returns) and the index is v3.
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
    require(meta.version < MetaVersion,
      s"index at $path is already v${meta.version} — nothing to migrate")
    val bandsDir = new org.apache.hadoop.fs.Path(s"$path/bands")
    if (meta.version == 1) {
      // ---- v1: pure file moves into ONE shared epoch ----
      val existing = Option(fs.listStatus(gramsDir))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("epoch="))
      // a crashed run created at most one epoch dir (this rule); more
      // means a hand-edited tree the move plan cannot reason about
      require(existing.length <= 1,
        s"index at $path has ${existing.length} epoch dirs under a " +
          "v1 meta — not a crashed v1 migration; rebuild the index")
      val epoch = existing.headOption
        .map(_.getPath.getName.stripPrefix("epoch="))
        .getOrElse(java.util.UUID.randomUUID().toString)
      // the flat v1 part files: skip _SUCCESS/.-prefixed metadata,
      // which Spark's path filter ignores wherever they sit
      val flat = Option(fs.listStatus(gramsDir))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
      if (flat.nonEmpty) {
        val epochDir = new org.apache.hadoop.fs.Path(gramsDir,
          s"epoch=$epoch")
        fs.mkdirs(epochDir)
        flat.foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(epochDir,
            st.getPath.getName)
          require(fs.rename(st.getPath, dest),
            s"rebuildFrom: failed to move ${st.getPath} -> $dest")
        }
      }
      // bands: flat band=<k> dirs move under the SAME epoch (matching
      // uuids are the tiered-compaction retirement invariant); a
      // re-run after a crash moves only the dirs still at top level
      val flatBands = Option(fs.listStatus(bandsDir))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("band="))
      if (flatBands.nonEmpty) {
        val bandsEpochDir = new org.apache.hadoop.fs.Path(bandsDir,
          s"epoch=$epoch")
        fs.mkdirs(bandsEpochDir)
        flatBands.foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(bandsEpochDir,
            st.getPath.getName)
          require(fs.rename(st.getPath, dest),
            s"rebuildFrom: failed to move ${st.getPath} -> $dest")
        }
      }
      mintMeta(spark, fs, path, meta.bands, meta.rowsPerBand,
        shingler.id, designThreshold)
    } else {
      // ---- v2: grams already epoch-partitioned; rebuild the bands
      // with each row's own epoch tag and swap the dir ----
      // crash recovery first: restore a half-swapped bands dir, then
      // clear stale stages from interrupted attempts
      val olds = glob(s"$path/bands_old-*")
      if (!fs.exists(bandsDir) && olds.nonEmpty) {
        require(fs.rename(olds.head.getPath, bandsDir),
          s"rebuildFrom: failed to restore bands at $path")
        olds.drop(1).foreach(s => fs.delete(s.getPath, true))
      } else olds.foreach(s => fs.delete(s.getPath, true))
      glob(s"$path/bands_migrate-*")
        .foreach(s => fs.delete(s.getPath, true))
      // a run that crashed between the swap and the meta mint left a
      // fully-migrated bands tree (the dir only ever changes by whole
      // renames) — detect it and skip straight to the mint
      val children = Option(fs.listStatus(bandsDir))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.isDirectory).map(_.getPath.getName)
      val alreadyTagged =
        children.nonEmpty && children.forall(_.startsWith("epoch="))
      if (!alreadyTagged) {
        val uuid = java.util.UUID.randomUUID().toString
        val stage = new org.apache.hadoop.fs.Path(path,
          s"bands_migrate-$uuid")
        // same rows re-laid-out: plan the file count from the CURRENT
        // bands bytes (the compact planner's argument)
        val nBands = compactionFilesFor(
          fs.getContentSummary(bandsDir).getLength)
        val g = spark.read.parquet(s"$path/grams") // epoch rides along
        bandsLayout(
            Dedup.bandTriplesFromHashes(g, "id", "gram_hashes", meta.bands,
              meta.rowsPerBand, carry = Seq("epoch")),
            nBands, fs.getContentSummary(gramsDir).getLength,
            Seq(col("epoch"), col("band"), col("bh")))
          .write.partitionBy("epoch", "band").parquet(stage.toString)
        val old = new org.apache.hadoop.fs.Path(path, s"bands_old-$uuid")
        require(fs.rename(bandsDir, old),
          s"rebuildFrom: failed to retire the v2 bands at $path")
        require(fs.rename(stage, bandsDir),
          s"rebuildFrom: failed to commit the v3 bands at $path")
        fs.delete(old, true)
      }
      // v2 metas always carry the contract — carry it forward; the
      // caller's shingler/threshold args are the v1-only assertion
      mintMeta(spark, fs, path, meta.bands, meta.rowsPerBand,
        meta.shingler.getOrElse(shingler.id),
        meta.designThreshold.getOrElse(designThreshold))
    }
  }

  /** Stage-then-swap the v3 meta row in (the [[rebuildFrom]] crash
    * contract: a completed stage with no meta is finished by the next
    * call). */
  private def mintMeta(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, bands: Int,
      rowsPerBand: Int, shinglerId: String, threshold: Double): Unit = {
    import spark.implicits._
    val metaDir = new org.apache.hadoop.fs.Path(s"$path/meta")
    val metaStage = new org.apache.hadoop.fs.Path(path,
      s"meta_staging-${java.util.UUID.randomUUID().toString}")
    Seq((MetaVersion, bands, rowsPerBand, shinglerId, threshold))
      .toDF("version", "bands", "rows_per_band", "shingler",
        "design_threshold")
      .coalesce(1).write.mode("overwrite").parquet(metaStage.toString)
    fs.delete(metaDir, true)
    require(fs.rename(metaStage, metaDir),
      s"rebuildFrom: failed to commit the meta $metaStage -> $metaDir")
  }

  /** Compact the index's accumulated epochs — the maintenance verb a
    * long-lived index needs: every [[append]] (and every
    * [[graft.streaming.StreamingDedupGate]] micro-batch) commits a
    * fresh epoch in each table, so a month of ingest is thousands of
    * tiny files every probe must enumerate and read — the classic
    * small-files cliff. This is the engine's counterpart of the
    * reference's post-ingest maintenance pass
    * (`01_ingest_raw_telemetry.py:141-167` runs ANALYZE + index builds
    * once bulk loading completes) — WITHOUT taking the index offline:
    * retirement-by-marker (below) keeps every probe state consistent,
    * so probes constructed at ANY point during (or after a crash of)
    * a compaction serve the correct pair set, and appends are additive
    * (an epoch not in the manifest survives commit untouched — and the
    * recovery GC's [[OrphanGraceMillis]] age gate keeps it from
    * mistaking an in-flight append's bands-without-grams window for
    * crash residue). The exclusive-access clause of earlier rounds is
    * gone; what remains is the vacuum grace contract for long-RUNNING
    * probes (see `retainRetired`).
    *
    * TIERED by `maxEpochBytes` (the LSM/size-tiered discipline): the
    * merge set is every epoch at or under the threshold, PLUS — the
    * promotion rule — any larger epoch whose size the merge set's
    * aggregate has reached (absorbed smallest-first, the aggregate
    * growing as it absorbs). The two rules together bound BOTH costs
    * that a maintenance policy must bound:
    *  - lifetime I/O: a serving loop that calls full-rewrite
    *    compaction every N micro-batches re-reads and re-writes the
    *    whole corpus per cycle — O(corpus²/batch) over the index's
    *    life. Under the tier, a byte is rewritten only while its
    *    epoch is small; under promotion, a large epoch is rewritten
    *    only when roughly its OWN size in new data has accumulated,
    *    so each byte is rewritten O(log(corpus/batch)) times total —
    *    the classic size-tiered bound;
    *  - epoch count: a tier WITHOUT promotion parks a fresh
    *    ~tier-sized epoch forever each time the merge output outgrows
    *    the threshold — ~400 k epoch directories at 100 TB with a
    *    256 MB tier, the small-files cliff reborn one level up.
    *    Promotion folds them geometrically: live epochs stay
    *    O(log(corpus/tier)) + the unmerged tail (~19 + compactEvery
    *    at 100 TB/256 MB).
    * The default (`Long.MaxValue`) merges everything — the one-shot
    * "defragment this index" verb, and exactly the pre-tier behavior;
    * [[graft.streaming.StreamingDedupGate]] passes a finite tier.
    * Retiring just the merged epochs' band rows is possible because
    * v3 bands are epoch-partitioned with uuids matching their grams
    * (the layout invariant [[rebuildFrom]] establishes) — which is
    * why compaction requires v3.
    *
    * Protocol (pure data movement — no shingling, no re-hashing; the
    * gram sets and band keys are byte-identical before and after —
    * and SNAPSHOT-ISOLATED: retirement is a marker, not a delete, and
    * the commit order makes every intermediate state probe-consistent):
    *
    *  1. finish any CRASHED compaction first (see recovery below),
    *     then retire orphan bands epochs (no grams twin = crash
    *     residue);
    *  2. select the LIVE (non-retired) epochs E at or under
    *     `maxEpochBytes` (all of them at the default); nothing
    *     selected, or one already-compact epoch → done;
    *  3. read the grams rows of E, coalesce to the planned file count,
    *     and write them to a `grams_compact-<uuid>` stage;
    *  4. derive the merged epoch's BANDS from the staged grams and
    *     append them under `bands/epoch=<stage-uuid>` (bands before
    *     manifest: manifest-present ⇒ bands complete, so recovery
    *     never needs a bands rebuild; until commit the new band rows
    *     only mint duplicate candidates, which probe dedups);
    *  5. write the `_EPOCHS` manifest (the epoch uuids of E) — ATOMIC
    *     via write-to-temp + rename, because the manifest IS the
    *     stage's completion marker and a trusted partial manifest
    *     would leave unlisted epochs alive beside their stage copies,
    *     serving duplicate rows;
    *  6. commit: rename the stage to `grams/epoch=<stage-uuid>` (the
    *     manifest rides inside), THEN mark each epoch in E retired in
    *     both tables ([[RetiredMarker]] touch) and drop the manifest.
    *     Rename-first is what keeps the window consistent: a probe
    *     planned between the rename and the marking reads the manifest
    *     out of the committed epoch and excludes E itself, so it never
    *     double-counts an id (manifest ∪ markers = the retired set);
    *  7. unless `retainRetired`, [[vacuum]] with zero grace — the
    *     retired directories delete and the disk behavior matches the
    *     pre-snapshot protocol exactly.
    *
    * Probe consistency at every point (why no lock is needed):
    * [[probe]] resolves the LIVE epoch set at plan time — a frame
    * planned BEFORE a compaction keeps reading the old epochs' files
    * (which still exist until vacuum), and a frame planned at any
    * point DURING one sees either the old set (pre-rename) or the
    * merged epoch with E excluded (post-rename) — the same pair set
    * in every case. `retainRetired = true` + a scheduled
    * [[vacuum]](grace ≥ the longest probe) is the serving
    * configuration: in-flight probes survive the whole maintenance
    * cycle (the Iceberg/Delta expire-snapshots contract). The default
    * (immediate vacuum) is for exclusively-owned indexes — batch
    * pipelines and the streaming gate — where nothing concurrent can
    * hold the old files.
    *
    * Crash recovery — every interrupted state is completed or
    * discarded by the NEXT compact() (or [[vacuum]]) call (the
    * [[rebuildFrom]] convention), and is probe-consistent MEANWHILE:
    *  - a stage without `_EPOCHS` is incomplete → the stage is deleted
    *    and its `bands/epoch=<stage-uuid>` rows retired (they were
    *    probe-visible, so a reader may still hold them — the grace
    *    applies to them too);
    *  - a stage WITH `_EPOCHS` is a committed-but-unswapped
    *    compaction → recovery renames it in and finishes the marking;
    *    epochs appended AFTER the crash are not in the manifest and
    *    survive untouched;
    *  - a committed epoch still carrying `_EPOCHS` (crash mid-marking)
    *    → the marking completes idempotently.
    *
    * `targetFiles = 0` (default) plans the compacted file count from
    * the selected epochs' REAL byte size ([[compactionFilesFor]] —
    * ~256 MB per file), so both the output layout and the rewrite's
    * parallelism scale with the data being merged; pass an explicit
    * count only to pin a test fixture. */
  def compact(spark: SparkSession, path: String,
      targetFiles: Int = 0,
      maxEpochBytes: Long = Long.MaxValue,
      retainRetired: Boolean = false): Unit = {
    require(targetFiles >= 0,
      s"targetFiles=$targetFiles must be >= 0 (0 = plan from bytes)")
    require(maxEpochBytes > 0,
      s"maxEpochBytes=$maxEpochBytes must be > 0 " +
        "(Long.MaxValue = merge every epoch)")
    val meta = readMeta(spark, path)
    require(meta.version >= 3,
      s"index at $path has the v${meta.version} layout — tiered " +
        "compaction needs epoch-tagged bands; migrate with " +
        "DedupIndex.rebuildFrom before compacting")
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    recoverCompaction(fs, path)
    def finish(): Unit = if (!retainRetired) vacuum(spark, path, 0L)
    // live = not retired (recovery above resolved every manifest into
    // markers, so markers are the complete retirement record here)
    val epochStats = Option(fs.listStatus(gramsDir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .filterNot(s => fs.exists(
        new org.apache.hadoop.fs.Path(s.getPath, RetiredMarker)))
      .map(s => (s.getPath.getName.stripPrefix("epoch="),
        fs.getContentSummary(s.getPath).getLength))
      .sortBy(_._2)
    require(epochStats.nonEmpty,
      s"index at $path has no live grams epochs — nothing to compact")
    // size-tiered selection with promotion ([[tieredSelect]], shared
    // with [[AnnIndex.compact]]): a big epoch is rewritten only when
    // ~its own volume of new data has accumulated (geometric folding,
    // O(log) rewrites per byte AND O(log) live epochs; see the scaladoc)
    val selected = tieredSelect(epochStats, maxEpochBytes)
    if (selected.isEmpty) { // every epoch already above the tier
      finish()
      return
    }
    val nGrams =
      if (targetFiles > 0) targetFiles
      else compactionFilesFor(selected.map(_._2).sum)
    // plan the bands file count HERE (not only at write time) because
    // the early return below must check it too: a v1-migrated epoch
    // inherits v1's flat band-file population by pure moves, so it can
    // be grams-compact while carrying hundreds of band files — an
    // early return keyed on grams alone would park that small-files
    // population forever on the tiered path (r16 verdict #2)
    val selBandsBytes = selected.map { case (e, _) =>
      val d = new org.apache.hadoop.fs.Path(s"$path/bands/epoch=$e")
      if (fs.exists(d)) fs.getContentSummary(d).getLength else 0L
    }.sum
    val nBands =
      if (targetFiles > 0) targetFiles
      else compactionFilesFor(
        if (selBandsBytes > 0) selBandsBytes else selected.map(_._2).sum)
    if (selected.length == 1) {
      val soleBands = new org.apache.hadoop.fs.Path(
        s"$path/bands/epoch=${selected.head._1}")
      // the achievable floor for the (epoch, band)-partitioned bands
      // is one file per band value present — a byte plan below that is
      // unreachable by ANY rewrite, so gating on nBands alone would
      // re-rewrite the same epoch every maintenance cycle
      val bandFloor =
        if (!fs.exists(soleBands)) 0
        else Option(fs.listStatus(soleBands))
          .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
          .count(s => s.isDirectory &&
            s.getPath.getName.startsWith("band="))
      if (dataFileCount(fs, new org.apache.hadoop.fs.Path(gramsDir,
            s"epoch=${selected.head._1}")) <= nGrams &&
          dataFileCountRecursive(fs, soleBands)
            <= math.max(nBands, bandFloor)) {
        // one small epoch already at its planned file count in BOTH
        // tables: merging it with itself would re-rewrite the same
        // bytes every maintenance cycle — the exact cost the tier
        // exists to avoid
        finish()
        return
      }
    }
    val epochs = selected.map(_._1).toSeq
    val stageUuid = java.util.UUID.randomUUID().toString
    val stage = new org.apache.hadoop.fs.Path(path,
      s"grams_compact-$stageUuid")
    // coalesce, not repartition: file-count control without shuffling
    // the merged gram volume (rows have no required order or key).
    // Read the SELECTED epoch dirs explicitly — an isin over the dir
    // listing would also pick up retired-but-unvacuumed epochs' rows
    spark.read.option("basePath", gramsDir.toString)
      .parquet(epochs.map(e => s"$path/grams/epoch=$e"): _*)
      .select("id", "gram_hashes")
      .coalesce(nGrams)
      .write.parquet(stage.toString)
    // merged epoch's bands, derived from the staged grams (bands are
    // a pure function of the stored hashes — provably consistent),
    // planned from the retired bands' real bytes (same rows re-laid;
    // nBands computed above, where the early return checks it).
    // Range-partition on (band, bh): each output partition spans one
    // or two band values, so the partitionBy write produces ~nBands
    // files TOTAL (a hash repartition on `band` alone would collapse
    // parallelism to |bands| tasks; no repartition at all would
    // re-create input-partitions × bands small files — the very
    // problem being compacted away)
    bandsLayout(
        Dedup.bandTriplesFromHashes(spark.read.parquet(stage.toString),
            "id", "gram_hashes", meta.bands, meta.rowsPerBand)
          .withColumn("epoch", lit(stageUuid)),
        nBands, fs.getContentSummary(stage).getLength,
        Seq(col("band"), col("bh")))
      .write.mode("append").partitionBy("epoch", "band")
      .parquet(s"$path/bands")
    writeManifest(fs, new org.apache.hadoop.fs.Path(stage, "_EPOCHS"),
      epochs)
    commitGramsStage(fs, path, stage)
    finish()
  }

  /** Marker file inside a retired epoch directory: the epoch's rows
    * live on (so probes planned before the retirement keep reading
    * them) but every NEW plan excludes it; [[vacuum]] deletes marked
    * epochs once the operator's grace has passed. */
  val RetiredMarker = "_RETIRED"

  /** Directory of reader leases at the index root: every [[probe]]
    * (and [[AnnIndex.probe]]) touches `_READERS/<uuid>` at PLAN time,
    * so the snapshot-isolation grace stops being an unbacked promise —
    * a graced [[vacuum]] refuses to reclaim a retired directory while
    * any live lease PREDATES its retirement (that reader's plan may
    * hold it). Leases are best-effort (a read-only filesystem degrades
    * silently to the grace-only contract), cannot be released by the
    * reader (a lazy frame never signals completion), and therefore
    * expire at [[LeaseHorizonMillis]] — the absolute bound on how long
    * a probe may run under the lease's protection; vacuum reaps
    * expired ones. A ZERO-grace vacuum (the [[compact]] default's
    * internal call — the exclusively-owned-index configuration)
    * ignores leases entirely: the owner's own immediate-collect probes
    * leave leases behind that must not wedge its maintenance loop. */
  val ReadersDir = "_READERS"

  /** How long a reader lease protects its plan-time snapshot. Probes
    * running longer than this are out of contract (set the vacuum
    * grace above their duration instead — `tools.ProbeGraceBench`
    * measures the floor). */
  val LeaseHorizonMillis: Long = 24L * 3600 * 1000

  /** Advertise a reader whose plan is being constructed NOW —
    * best-effort: on a filesystem this process cannot write to, the
    * probe still works and the operator falls back to the grace-only
    * contract. */
  private[operators] def leaveLease(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Unit =
    try {
      val dir = new org.apache.hadoop.fs.Path(path, ReadersDir)
      fs.mkdirs(dir)
      fs.create(new org.apache.hadoop.fs.Path(dir,
        java.util.UUID.randomUUID().toString), false).close()
    } catch { case scala.util.control.NonFatal(_) => () }

  /** The oldest LIVE lease's plan time (None when no reader is
    * advertised), reaping expired leases on the way — the one value a
    * graced vacuum compares retirement times against. */
  private[operators] def oldestLiveLease(
      fs: org.apache.hadoop.fs.FileSystem, path: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(path, ReadersDir)
    if (!fs.exists(dir)) return None
    val horizon = System.currentTimeMillis() - LeaseHorizonMillis
    val leases = Option(fs.listStatus(dir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(_.isFile)
    val (expired, live) = leases.partition(_.getModificationTime < horizon)
    expired.foreach { l =>
      try fs.delete(l.getPath, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    if (live.isEmpty) None else Some(live.map(_.getModificationTime).min)
  }

  /** Physically delete retired epochs older than `olderThanMillis`
    * (marker mtime) from both tables — the disk-reclaim half of the
    * snapshot-isolation contract: [[compact]] only ever MARKS epochs
    * retired, so probes planned before a compaction keep working;
    * vacuum is where their files actually go away, and the grace is
    * the operator's promise about the longest-running probe (the
    * Iceberg/Delta expire-snapshots shape). The floor for that promise
    * is MEASURED, not guessed: `graft.tools.ProbeGraceBench` reports
    * worst-case probe plan-to-finish wall time per probe shape at
    * sf0.1 and 10× (SCALING.md "vacuum-grace floor" table) — set the
    * grace to a comfortable multiple of the slowest shape served.
    * And the promise is ENFORCED up to the lease horizon: probes
    * advertise their plan time in [[ReadersDir]], and a graced vacuum
    * refuses to reclaim anything a live lease predates — a mis-set
    * grace degrades to deferred reclaim, not a mid-scan
    * FileNotFound. Completes any interrupted retirement marking
    * first, so it is safe to call on a crashed tree. Zero grace (the
    * [[compact]] default's internal call) is the forced
    * exclusive-ownership path: no lease check, reclaims everything
    * retired. */
  def vacuum(spark: SparkSession, path: String,
      olderThanMillis: Long = 0L): Unit = {
    require(olderThanMillis >= 0,
      s"olderThanMillis=$olderThanMillis must be >= 0")
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    completeRetirement(fs, path)
    val cutoff = System.currentTimeMillis() - olderThanMillis
    // a GRACED vacuum also honors reader leases: a retired epoch is
    // reclaimed only if every live lease was planned AFTER its
    // retirement (an older lease's plan may hold the epoch's files).
    // Zero grace = the forced exclusive-ownership path — no leases
    // (see [[ReadersDir]]).
    val oldestLease =
      if (olderThanMillis == 0) None else oldestLiveLease(fs, path)
    Seq("grams", "bands").foreach { sub =>
      Option(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub")))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("epoch="))
        .foreach { d =>
          val m = new org.apache.hadoop.fs.Path(d.getPath, RetiredMarker)
          if (fs.exists(m)) {
            val mt = fs.getFileStatus(m).getModificationTime
            if (mt <= cutoff && oldestLease.forall(_ > mt))
              fs.delete(d.getPath, true)
          }
        }
    }
  }

  /** Step 1 of [[compact]]: complete or discard residue of a crashed
    * compaction, then retire orphan bands epochs. A no-op on a clean
    * tree. */
  private def recoverCompaction(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    def glob(pattern: String) =
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(pattern)))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
    glob(s"$path/grams_compact-*").foreach { st =>
      if (fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_EPOCHS")))
        commitGramsStage(fs, path, st.getPath)
      else {
        // incomplete stage: discard it AND retire the merged-epoch
        // band rows it may have appended (they derive from the
        // discarded stage; they were probe-visible — harmless
        // duplicate candidates — so they take the retirement path,
        // not a hard delete a long-running reader could trip on)
        val uuid = st.getPath.getName.stripPrefix("grams_compact-")
        fs.delete(st.getPath, true)
        retire(fs, new org.apache.hadoop.fs.Path(
          s"$path/bands/epoch=$uuid"))
      }
    }
    completeRetirement(fs, path)
    // orphan-bands retirement: a bands epoch with no grams twin (live
    // OR retired) is USUALLY crash residue — a failed append (bands
    // commit first, grams last; the gate replays the batch under a
    // fresh epoch). But an IN-FLIGHT concurrent append is
    // indistinguishable from that residue by structure alone: it too
    // has committed bands and not yet grams, and retiring it here
    // (then vacuuming, on the default path) would leave the index
    // permanently serving grams-without-bands once its grams epoch
    // lands — silently missing pairs. The bands→grams gap in a live
    // append is one directory rename plus job planning (the grams
    // stage is fully written BEFORE the bands write starts — see
    // [[writeTables]]), so AGE separates the two cases cleanly: only
    // orphans whose bands dir has sat unmodified for
    // [[OrphanGraceMillis]] are retired; younger ones are left for a
    // later pass. Harmless meanwhile — orphan band rows only mint
    // duplicate candidates, which probe dedups.
    def epochNames(sub: String): Set[String] =
      Option(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub")))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("epoch="))
        .map(_.getPath.getName.stripPrefix("epoch=")).toSet
    val twins = epochNames("grams")
    val cutoff = System.currentTimeMillis() - OrphanGraceMillis
    (epochNames("bands") -- twins).foreach { e =>
      val d = new org.apache.hadoop.fs.Path(s"$path/bands/epoch=$e")
      if (fs.getFileStatus(d).getModificationTime <= cutoff)
        retire(fs, d)
    }
  }

  /** How long an orphan bands epoch (bands without a grams twin) must
    * sit unmodified before the recovery GC treats it as crash residue
    * rather than an in-flight append's not-yet-twinned bands. A live
    * append closes the gap in seconds (grams are staged before the
    * bands write and commit by one rename); an hour of silence is
    * residue. */
  val OrphanGraceMillis: Long = 60L * 60 * 1000

  /** Finish any interrupted retirement marking: a committed epoch
    * still carrying its `_EPOCHS` manifest names epochs whose markers
    * may not all be down yet — touch them (idempotent) and drop the
    * manifest. New probes treat manifest-named epochs as retired even
    * before this runs, so the window needs no lock. */
  private def completeRetirement(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit =
    Option(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/grams")))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
      .foreach { d =>
        val manifest = new org.apache.hadoop.fs.Path(d.getPath, "_EPOCHS")
        if (fs.exists(manifest)) {
          readLines(fs, manifest).foreach { e =>
            retire(fs, new org.apache.hadoop.fs.Path(
              s"$path/grams/epoch=$e"))
            retire(fs, new org.apache.hadoop.fs.Path(
              s"$path/bands/epoch=$e"))
          }
          fs.delete(manifest, false)
        }
      }

  private def retire(fs: org.apache.hadoop.fs.FileSystem,
      epochDir: org.apache.hadoop.fs.Path): Unit =
    if (fs.exists(epochDir))
      touch(fs, new org.apache.hadoop.fs.Path(epochDir, RetiredMarker))

  /** Commit a COMPLETE grams stage (has `_EPOCHS`): rename it in as
    * one new epoch — the manifest rides inside, so from this instant
    * new probes exclude the merged epochs by manifest — then finish
    * the retirement marking. Idempotent: a re-run after any crash
    * point finishes the rename and/or the marking. */
  private def commitGramsStage(fs: org.apache.hadoop.fs.FileSystem,
      path: String, stage: org.apache.hadoop.fs.Path): Unit = {
    val uuid = stage.getName.stripPrefix("grams_compact-")
    val committed = new org.apache.hadoop.fs.Path(
      s"$path/grams/epoch=$uuid")
    fs.mkdirs(committed.getParent)
    require(fs.rename(stage, committed),
      s"compact: failed to commit grams stage $stage -> $committed")
    // marking AFTER the rename: between the two, new probes exclude
    // the merged epochs via the manifest now inside the committed
    // epoch (underscore files are invisible to parquet readers, so
    // the data read is unaffected); completeRetirement drops it once
    // every marker is down
    completeRetirement(fs, path)
  }

  /** How many bytes of source data one compacted file should hold —
    * the parquet sweet spot: big enough that footer/rowgroup overhead
    * and open() costs amortize, small enough that one file is one
    * sanely-sized task on read-back. */
  val CompactionFileBytes: Long = 256L * 1024 * 1024

  /** Lay a bands frame out for its partitioned write: range-partition
    * into the planned file count — except when the plan is ONE file and
    * the staged source fits a single scan split (`srcBytes` ≤
    * `spark.sql.files.maxPartitionBytes`): then the pipeline is
    * single-task with or without the exchange, so the range shuffle is
    * pure overhead and a `coalesce(1)` produces the byte-identical file
    * layout with one less stage (guide §2.4 — remove shuffles that move
    * nothing). Larger stages keep the range plan: it is what preserves
    * the rewrite's parallelism AND the ~`nFiles` total file count under
    * the `partitionBy` write. */
  private def bandsLayout(df: DataFrame, nFiles: Int, srcBytes: Long,
      rangeCols: Seq[Column]): DataFrame =
    if (nFiles == 1 && srcBytes <= maxSplitBytes(df.sparkSession))
      df.coalesce(1)
    else df.repartitionByRange(nFiles, rangeCols: _*)

  /** The session's scan-split size (`spark.sql.files.maxPartitionBytes`,
    * size-string form — default "128MB"). */
  private def maxSplitBytes(spark: SparkSession): Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))

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

  /** Data (non-underscore, non-dot) files directly inside `dir`. */
  private def dataFileCount(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Int =
    Option(fs.listStatus(dir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .count(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))

  /** Data files anywhere under `dir` (partitioned tables nest them in
    * value subdirs — bands epochs, ANN cell dirs). 0 for a missing
    * dir. Shared with [[AnnIndex.compact]]'s early return. */
  private[operators] def dataFileCountRecursive(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Int =
    if (!fs.exists(dir)) 0
    else Option(fs.listStatus(dir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .map { s =>
        if (s.isDirectory) dataFileCountRecursive(fs, s.getPath)
        else if (!s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith(".")) 1
        else 0
      }.sum

  /** Size-tiered merge selection with promotion — the policy both
    * persisted indexes compact under ([[compact]] scaladoc for the
    * cost model). `stats` must be (epoch, bytes) sorted by bytes
    * ascending; returns the merge set: every epoch at or under
    * `maxEpochBytes`, plus larger epochs absorbed smallest-first while
    * the aggregate has grown past each one's size. Empty when nothing
    * is under the tier. */
  private[operators] def tieredSelect(stats: Seq[(String, Long)],
      maxEpochBytes: Long): Seq[(String, Long)] = {
    val (tier, rest) = stats.partition(_._2 <= maxEpochBytes)
    if (tier.isEmpty) Seq.empty
    else {
      var agg = tier.map(_._2).sum
      val promoted = rest.takeWhile { case (_, bytes) =>
        val in = bytes <= agg
        if (in) agg += bytes
        in
      }
      tier ++ promoted
    }
  }

  private[operators] def touch(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(p)) {
      val out = fs.create(p, false)
      out.close()
    }
  }

  /** Write a manifest ATOMICALLY: full content to `<name>.tmp`, then
    * rename into place. The manifest doubles as a stage's completion
    * marker checked by EXISTENCE, so it must appear all-or-nothing — a
    * crash mid-write must leave a `.tmp` recovery ignores, never a
    * partial manifest recovery would trust (r15 verdict #2: trusting a
    * truncated epoch list leaves the unlisted epochs alive beside
    * their stage copies — duplicate index rows). Shared with
    * [[AnnIndex.compact]]'s `_FILES`. */
  private[graft] def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, lines: Seq[String]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s"${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, p),
      s"failed to commit manifest $tmp -> $p")
  }

  private[graft] def readLines(fs: org.apache.hadoop.fs.FileSystem,
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
    * SNAPSHOT-ISOLATED vs maintenance: the plan resolves the LIVE
    * epoch set at construction time — retired epochs (marker or a
    * committed-but-still-marking compaction's manifest) are excluded
    * from the explicit path list, and since [[compact]] never deletes
    * what it retires (that is [[vacuum]]'s job, under the operator's
    * grace), a frame planned at ANY point before/during/after a
    * compaction — or after a crash of one, before recovery — reads a
    * consistent epoch snapshot and serves the same pair set. The one
    * contract left for the operator is the vacuum grace ≥ the longest
    * probe.
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
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // advertise this plan to graced vacuums (see [[ReadersDir]]) —
    // BEFORE resolving the live set, so no epoch live at our plan
    // time can be reclaimed from under the frame within the horizon
    leaveLease(fs, path)
    val retired = retiredEpochs(fs, path)
    val gramsT = liveTable(spark, fs, path, "grams", retired)
      .select("id", "gram_hashes")
    val bandsT = liveTable(spark, fs, path, "bands", retired)
    if (batch.count() <= maxBroadcastBatch(spark))
      probeBroadcast(gramsT, bandsT, batch, idCol, textCol, threshold,
        shingler, meta)
    else
      probeKeyed(gramsT, bandsT, batch, idCol, textCol, threshold,
        shingler, meta)
  }

  /** The retirement record a new plan must exclude: epochs carrying a
    * [[RetiredMarker]] in either table, plus epochs named by any
    * committed compaction's still-riding `_EPOCHS` manifest (the
    * rename-then-mark window — treating the manifest as retirement
    * makes that window need no lock: without it, a probe planned
    * after the rename but before the markers land would read each
    * merged id twice and emit duplicate pairs). */
  private def retiredEpochs(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Set[String] = {
    def epochDirs(sub: String) =
      Option(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/$sub")))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith("epoch="))
    val all = epochDirs("grams") ++ epochDirs("bands")
    val byMarker = all.filter(d => fs.exists(
        new org.apache.hadoop.fs.Path(d.getPath, RetiredMarker)))
      .map(_.getPath.getName.stripPrefix("epoch="))
    val byManifest = epochDirs("grams").flatMap { d =>
      val m = new org.apache.hadoop.fs.Path(d.getPath, "_EPOCHS")
      if (fs.exists(m)) readLines(fs, m) else Seq.empty
    }
    (byMarker ++ byManifest).toSet
  }

  /** One table's LIVE rows: the non-retired epoch directories read as
    * explicit paths (basePath keeps the partition columns), or the
    * whole directory for a pre-epoch v1 layout (no epoch dirs — flat
    * files / flat band=k dirs, nothing is ever retired there). */
  private def liveTable(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, path: String, sub: String,
      retired: Set[String]): DataFrame = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/$sub")
    val epochs = Option(fs.listStatus(dir))
      .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
    if (epochs.isEmpty) spark.read.parquet(dir.toString)
    else {
      val live = epochs.filterNot(e =>
        retired(e.getPath.getName.stripPrefix("epoch=")))
      require(live.nonEmpty,
        s"index at $path has no live $sub epochs — every epoch is " +
          "retired, which no committed state produces; restore the " +
          "tree before probing")
      spark.read.option("basePath", dir.toString)
        .parquet(live.map(_.getPath.toString): _*)
    }
  }

  /** The crawl-increment plan: batch side computed twice (bands + gram
    * sets) — both passes are over the small side and both ship as
    * broadcasts; the result stays lazy, so there is nothing to
    * pin-and-release here. */
  private def probeBroadcast(gramsT: DataFrame, bandsT: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingler: Shingler, meta: Meta): DataFrame = {
    val bsh = batch
      .select(col(idCol).as("batch_id"), shingler(col(textCol)).as("_sh"))
      .where(size(col("_sh")) > 0)
    val bb = Dedup.bandTriples(bsh, "batch_id", "_sh", meta.bands,
      meta.rowsPerBand)
    val cands = bandsT
      .join(broadcast(bb), Seq("band", "bh"))
      .select("id", "batch_id")
      .dropDuplicates("id", "batch_id")
    // candidates broadcast back against the grams table: the (large)
    // index side streams through a BroadcastHashJoin — no shuffle
    gramsT
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
  private def probeKeyed(gramsT: DataFrame, bandsT: DataFrame,
      batch: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingler: Shingler, meta: Meta): DataFrame = {
    val bsh = batch
      .select(col(idCol).as("batch_id"), shingler(col(textCol)).as("_sh"))
      .where(size(col("_sh")) > 0)
      .persistTracked
    try {
      val bb = Dedup.bandTriples(bsh, "batch_id", "_sh", meta.bands,
        meta.rowsPerBand)
      val cands = bandsT
        .join(bb, Seq("band", "bh"))
        .select("id", "batch_id")
        .dropDuplicates("id", "batch_id")
      val verified = gramsT
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
    * a STAGING directory beside the tables (invisible to readers by
    * path); the bands rows are then computed FROM the staged files —
    * epoch-tagged and range-planned to ~⌈bytes/256 MB⌉ output files,
    * so an append adds a handful of files, not input-partitions ×
    * bands of them (r15 verdict #6: the gate's 20-append fixture used
    * to mint 10,752 band files; the accumulation rate is now cut at
    * the source instead of only being repaired by compact) — and the
    * grams epoch is committed LAST by an atomic directory rename into
    * `grams/epoch=<uuid>`. Two properties, both load-bearing:
    *
    *  - the source frame executes exactly once, so the bands keys are
    *    derived from — and provably consistent with — the verification
    *    sets, and nondeterministic inputs cannot desynchronize them;
    *  - grams-commit-last preserves [[graft.streaming.StreamingDedupGate]]'s
    *    crash-residual contract: a crash mid-append can leave band rows
    *    without grams rows (harmless — probe dedups candidates, a
    *    replayed append re-writes both, and [[compact]]'s recovery GCs
    *    the orphan bands epoch), never grams without bands, which
    *    would duplicate probe pairs after a replay. A crash before the
    *    bands write leaks only a staging dir probes never read
    *    (glob-cleared by the next overwrite build). */
  private def writeTables(df: DataFrame, idCol: String, textCol: String,
      path: String, shingler: Shingler, bands: Int,
      rowsPerBand: Int, overwrite: Boolean): Unit = {
    val spark = df.sparkSession
    val epoch = java.util.UUID.randomUUID().toString
    val gramsDir = new org.apache.hadoop.fs.Path(s"$path/grams")
    val fs = gramsDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (overwrite) {
      fs.delete(gramsDir, true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/bands"), true)
      fs.delete(new org.apache.hadoop.fs.Path(path, CompactingMarker),
        false)
      // stale reader leases reference the index being replaced — left
      // behind they would block graced vacuums for a whole horizon
      fs.delete(new org.apache.hadoop.fs.Path(path, ReadersDir), true)
      // also clear any crash-leaked staging dirs from prior appends,
      // compactions, and migrations — a rebuild supersedes every stage
      Seq("grams_staging-*", "grams_compact-*", "bands_migrate-*",
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
    // REBALANCE before the write (guide §6: aim for 128 MB–1 GB output
    // files): the shingle/hash work still runs at the input's full
    // parallelism, then AQE sizes the WRITE tasks from the hashed-gram
    // bytes actually flowing — a tiny append commits one file instead
    // of one per input partition (measured 32 × ~10 KB per append at
    // bench scale: the staging dir's task-commit count, not the
    // hashing, dominated append wall time), and a huge backfill still
    // fans out to ~advisory-size files. The hint costs one shuffle of
    // the batch's hashed grams (not its text) — the Iceberg
    // write.distribution-mode precedent.
    df.select(col(idCol).as("id"), shingler(col(textCol)).as("_sh"))
      .where(size(col("_sh")) > 0)
      .select(col("id"), gramHashes(col("_sh")).as("gram_hashes"))
      .hint("rebalance")
      .write.mode("overwrite").parquet(staging.toString)
    val g = spark.read.parquet(staging.toString)
    // band file count planned from this batch's REAL staged bytes
    // (bands rows are smaller than their gram sets, so the files run
    // under the 256 MB target — bounded, and one append's worth)
    val stagedBytes = fs.getContentSummary(staging).getLength
    val nBands = compactionFilesFor(stagedBytes)
    bandsLayout(
        Dedup.bandTriplesFromHashes(g, "id", "gram_hashes", bands,
            rowsPerBand)
          .withColumn("epoch", lit(epoch)),
        nBands, stagedBytes,
        Seq(col("band"), col("bh")))
      .write.mode("append").partitionBy("epoch", "band")
      .parquet(s"$path/bands")
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

  /** METADATA cache for [[readMeta]] (never row data): one probe/append
    * cycle reads the 1-row meta parquet 5–10 times, and each read is a
    * full Spark job — fixed scheduling cost that dwarfs the row. The
    * cache key is the meta directory's file fingerprint (name, mtime,
    * length of every file), checked with ONE listStatus per call — a
    * rebuilt or migrated meta mints new files (uuid-staged rename or a
    * fresh overwrite), so any writer invalidates the entry. Bounded: one
    * tiny entry per index path served by this JVM. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Seq[(String, Long, Long)], Meta)]()

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val dir = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp: Seq[(String, Long, Long)] =
      Option(fs.listStatus(dir))
        .getOrElse(Array.empty[org.apache.hadoop.fs.FileStatus])
        .filter(_.isFile)
        .map(s => (s.getPath.getName, s.getModificationTime, s.getLen))
        .sortBy(_._1).toSeq
    val cached = metaCache.get(path)
    if (cached != null && cached._1 == fp) return cached._2
    val df = spark.read.parquet(s"$path/meta")
    val m = df.head()
    val has = df.columns.toSet
    val meta = Meta(
      if (has("version")) m.getAs[Int]("version") else 1,
      m.getAs[Int]("bands"), m.getAs[Int]("rows_per_band"),
      if (has("shingler")) Some(m.getAs[String]("shingler")) else None,
      if (has("design_threshold"))
        Some(m.getAs[Double]("design_threshold"))
      else None)
    metaCache.put(path, (fp, meta))
    meta
  }
}
