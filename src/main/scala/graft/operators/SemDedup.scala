package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication by CLUSTER-SCOPED pruning (Abbas
  * et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540): k-means-cluster the
  * embedding space, then form near-duplicate pairs only WITHIN each
  * cluster. This is the paper's own scale mechanism and the second of
  * the library's two embedding-dedup shapes — [[Dedup.dropEmbeddingDups]]
  * bounds pair formation by LSH buckets, this one by quantizer cells:
  * k cells of ~n/k rows cost Σ(n/k)² = n²/k pair candidates instead of
  * n², and k grows with the corpus. Both are keyed joins, never
  * corpus-all-pairs.
  *
  * Within a duplicate GROUP (connected component of the ≥-threshold
  * cosine graph, the paper's ε-ball chains) ONE representative is
  * kept: the member with the LOWEST cosine to its cluster centroid —
  * the paper's keep-the-outlier policy, which retains the most diverse
  * example of each semantic clump — ties to the smallest id.
  *
  * Engine-exact discipline: cluster assignment is [[KMeans.assign]]'s
  * integer-quantized nearest-centroid (the q_kmeans_iter /
  * q_cluster_balance oracle convention), and every cosine quantizes to
  * floor(cos·10⁶) BEFORE any comparison, so both the pair set and the
  * keep pick replay bit-for-bit in SQL.
  *
  * Known recall trade, documented AND measured (SCALING.md r14
  * boundary fixture): a near-dup pair SPLIT ACROSS two cells is not
  * examined (the paper accepts the same — ε-balls near cell
  * boundaries). Raising k sharpens cost and loses boundary pairs
  * sooner; the LSH-bucketed sibling makes the opposite trade; and
  * `probeCells > 1` buys boundary recall back by letting each row
  * form pairs in its probeCells nearest cells (pair formation only —
  * verdict semantics unchanged), at ~probeCells² the candidate work.
  */
object SemDedup {

  /** Per-cell row count above which [[verdicts]] switches that cell's
    * pair formation from the plain cluster-keyed self-join to an
    * exact grid split (see below). The binding constraint is per-TASK
    * pair work: one join key carrying an m-row cell computes m²/2
    * cosines in one task, so a degenerate cell (near-identical
    * boilerplate, a collapsed quantizer region — exactly the inputs
    * semantic dedup sees) turns into a straggler or an executor OOM
    * with no error. 16384² / 2 ≈ 1.3·10⁸ cosines bounds a task at
    * seconds, not hours. Overridable per session via
    * `graft.semdedup.maxCellRows` (specs plant a hot cell and lower
    * it to force the split at test scale). */
  val MaxCellRowsDefault: Long = 16384L

  private def maxCellRows(
      spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.semdedup.maxCellRows")
      .map(_.toLong).getOrElse(MaxCellRowsDefault)

  /** Plan k for a corpus of `n` rows — the [[Dedup.lshPlanFor]]
    * convention: derive the scale knob from the corpus instead of
    * hard-coding it. SemDeDup's cost is Σ m_c² ≈ n·(n/k) candidate
    * cosines on balanced cells, so k must GROW with the corpus to
    * hold per-cell work constant: k = ⌈n / targetCellRows⌉ keeps the
    * expected cell at `targetCellRows` rows and total candidate work
    * at n·targetCellRows — linear in n. The default target (2048)
    * sits 8× under [[MaxCellRowsDefault]], so only genuinely skewed
    * cells (not planning slack) engage the grid split. Raising k
    * sharpens cost and loses boundary pairs sooner (the documented
    * recall trade above).
    *
    * `probeCells` (r14 verdict #3): pass the SAME value [[verdicts]]
    * will run with. Multi-probe pair formation joins on the PROBED
    * occupancy — every row occupies its probeCells nearest cells, so
    * the join key's true cardinality is probeCells·n/k rows per cell,
    * ~probeCells² the candidate work at a k planned for assigned
    * occupancy (SCALING.md's explanation of the 2-probe 6.9× fixed-k
    * row). Scaling the budget to k = ⌈probeCells·n / targetCellRows⌉
    * holds PROBED rows per cell — and with them per-task pair work —
    * at the single-probe target. */
  def semdedupKFor(n: Long, targetCellRows: Long = 2048L,
      probeCells: Int = 1): Int = {
    require(n >= 1, s"corpus size n=$n must be >= 1")
    require(targetCellRows >= 1,
      s"targetCellRows=$targetCellRows must be >= 1")
    require(probeCells >= 1, s"probeCells=$probeCells must be >= 1")
    // floor at probeCells: verdicts requires probeCells <= k (a probe
    // list needs that many distinct cells to exist)
    ((probeCells * n + targetCellRows - 1) / targetCellRows)
      .max(probeCells.toLong)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Per-row verdicts: (idCol, cluster, component, centroid_cos_q,
    * keep). `keep` marks each component's representative; filtering is
    * the caller's `where(col("keep"))` — verdicts are returned rather
    * than applied so the drop decision stays auditable (the curation-
    * funnel convention).
    *
    * The plan is LAZY end to end: assignment is a row-local broadcast
    * UDF recomputed per consumer (cheap, embarrassingly parallel —
    * the [[DedupIndex]] recompute argument), the pair join is
    * cluster-keyed, and [[Dedup.connectedComponents]] materializes the
    * component labels internally (checkpointed, cache-released).
    *
    * Hot-cell guard (the [[Dedup.minhashDupPairs]] flood-guard
    * discipline): one k-row driver probe counts rows per cell; when
    * every cell is ≤ `graft.semdedup.maxCellRows`, the pair join is
    * EXACTLY the unguarded cluster-keyed self-join (the guard costs
    * only the probe). Oversized cells switch to an exact grid split:
    * rows salt into g = ⌈m / cap⌉ buckets by id hash, the A side
    * replicates each row to grid cells (b, b..g−1), the B side to
    * (0..b, b), and the join key becomes (cluster, bl, br) — every
    * unordered in-cell pair meets at exactly one grid cell (same-
    * bucket keys produce both orderings; the bl = br ⇒ id_a < id_b
    * predicate keeps one), so the pair SET — and therefore every
    * verdict — is bit-identical to the unguarded plan while per-task
    * work drops from m² to (m/g)·m ≈ cap·m spread over g tasks.
    * Replication cost: ~(g+1)/2× on the hot cell's rows only.
    *
    * @param centroids pre-trained quantized centroids (e.g. from
    *        [[KMeans.train]]); None → deterministic
    *        [[KMeans.initCentroids]] seeding, the SQL-replayable
    *        default
    * @param probeCells cells each row's PAIR FORMATION probes (its
    *        probeCells nearest — 1 = the paper's single-cell scan,
    *        the default and the oracle-checked plan; 2 recovers most
    *        boundary-straddling pairs at ~4× candidate work, measured
    *        in SCALING.md). Keep-pick/components always use the
    *        1-nearest assignment. */
  def verdicts(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, threshold: Double, scale: Int = 1024,
      centroids: Option[Array[Array[Long]]] = None,
      probeCells: Int = 1): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    require(threshold > 0 && threshold <= 1,
      s"threshold $threshold outside (0,1]")
    require(probeCells >= 1 && probeCells <= k,
      s"probeCells=$probeCells outside [1, k=$k]")
    val spark = corpus.sparkSession
    graft.plans.GraftExtensions.register(spark)
    import spark.implicits._
    val cs = centroids.getOrElse(
      KMeans.initCentroids(corpus, idCol, vecCol, k, scale))
    val v = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    // persistTracked: the assignment feeds the hot-cell probe (an
    // eager collect), both sides of the pair join, the component
    // vertex list, AND the returned keep-pick plan — without the cache
    // the nearest-centroid scan re-evaluates 4-5×. Registered with
    // Caches, released by the session's post-consume Caches.clear()
    // sweep (the multi-consumer convention). With probeCells > 1 the
    // corpus is scanned through the centroid UDF exactly ONCE
    // (assignN), and the 1-nearest assignment is a projection of the
    // same cached frame — element 0 of the probe list IS assign's
    // cluster (nearestN's documented head contract).
    import Caches.Persisted
    val probed =
      if (probeCells == 1) None
      else Some(KMeans.assignN(v, "v", scale, cs, probeCells, "_cells")
        .persistTracked)
    val assigned = probed match {
      case None => KMeans.assign(v, "v", scale, cs).persistTracked
      case Some(p) =>
        p.withColumn("cluster", element_at(col("_cells"), 1))
          .drop("_cells")
    }
    val thresholdQ = math.floor(threshold * 1e6).toLong
    val cq = floor(SimilaritySearch.cosine(col("va"), col("vb")) * 1e6)
      .cast("long")
    // multi-probe pair DOMAIN (probeCells > 1 — the boundary-recall
    // knob): each row participates in its probeCells nearest cells for
    // PAIR FORMATION ONLY — components, centroid cosine, and the
    // keep-pick stay on the 1-nearest assignment, so the verdict
    // semantics are unchanged and only the examined pair set grows. A
    // near-dup pair whose members quantize into adjacent cells (the
    // documented cross-cell recall trade) is examined iff the members'
    // probe lists SHARE a cell — including a third cell neither member
    // is assigned to (the join is on shared probed cell) — SCALING.md
    // measures the recall/cost pair on a planted boundary fixture. A
    // pair sharing SEVERAL probed cells is kept exactly once, at the
    // SMALLEST shared cell (array_intersect over two probeCells-sized
    // lists — a row-local filter, not a distinct shuffle). Default 1 =
    // the r13 plan, byte-identical.
    val domain = probed match {
      case None => assigned
      case Some(p) => p.withColumn("cluster", explode(col("_cells")))
    }
    // the single-meet filter: a multi-probed pair sharing several
    // cells is kept exactly once — at the smallest shared cell; with
    // probeCells = 1 this is Literal(true) and PruneFilters removes
    // it, so the default plans stay byte-identical to r13
    val meetOnce =
      if (probeCells == 1) lit(true)
      else col("cluster") ===
        array_min(array_intersect(col("_ca"), col("_cb")))
    def sideCells(alias: String): Seq[Column] =
      if (probeCells == 1) Seq()
      else Seq(col("_cells").as(alias))
    // hot-cell probe: at most k rows (one map-side-combined agg), so
    // the collect is bounded by a caller argument, not the corpus
    // (probeCells > 1 counts PROBED occupancy — the join key's true
    // cardinality)
    val cap = maxCellRows(spark)
    val hotCells = domain.groupBy("cluster")
      .agg(count(lit(1)).as("_m")).where(col("_m") > cap)
      .collect()
      .map(r => (r.getAs[Int]("cluster"),
        ((r.getAs[Long]("_m") + cap - 1) / cap).toInt))
    val pairs =
      if (hotCells.isEmpty) {
        // the r12 plan, verbatim: cluster-keyed self-join
        domain
          .select(Seq(col("id").as("id_a"), col("cluster"),
            col("v").as("va")) ++ sideCells("_ca"): _*)
          .join(domain.select(Seq(col("id").as("id_b"), col("cluster"),
            col("v").as("vb")) ++ sideCells("_cb"): _*), Seq("cluster"))
          .where(col("id_a") < col("id_b"))
          .where(meetOnce)
          .withColumn("cq", cq)
          .where(col("cq") >= thresholdQ)
          .select("id_a", "id_b")
      } else {
        // exact grid split (scaladoc above): cold cells ride the same
        // plan with g = 1 — one bucket, key (cluster, 0, 0), identical
        // pair set to the unguarded join
        val gDf = broadcast(hotCells.toSeq.toDF("cluster", "_g"))
        val withG = domain.join(gDf, Seq("cluster"), "left")
          .withColumn("_g", coalesce(col("_g"), lit(1)))
          .withColumn("_b", pmod(xxhash64(col("id")), col("_g"))
            .cast("int"))
        val aSide = withG.select(Seq(col("id").as("id_a"), col("cluster"),
          col("v").as("va"), col("_b").as("bl"),
          explode(sequence(col("_b"), col("_g") - 1)).as("br")) ++
          sideCells("_ca"): _*)
        val bSide = withG.select(Seq(col("id").as("id_b"), col("cluster"),
          col("v").as("vb"), col("_b").as("br"),
          explode(sequence(lit(0), col("_b"))).as("bl")) ++
          sideCells("_cb"): _*)
        aSide.join(bSide, Seq("cluster", "bl", "br"))
          .where(col("bl") =!= col("br") || col("id_a") < col("id_b"))
          .where(meetOnce)
          .withColumn("cq", cq)
          .where(col("cq") >= thresholdQ)
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"))
      }
    val comps = Dedup.connectedComponents(
      assigned.select("id"), pairs, "id")
    val centDf = broadcast(KMeans.dequantize(cs, scale).zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cluster", "centroid"))
    val w = Window.partitionBy("component")
      .orderBy(col("centroid_cos_q").asc, col("id").asc)
    assigned.join(centDf, Seq("cluster"))
      .withColumn("centroid_cos_q",
        floor(SimilaritySearch.cosine(col("v"), col("centroid")) * 1e6)
          .cast("long"))
      .join(comps, Seq("id"))
      .withColumn("keep", row_number().over(w) === 1)
      .select(col("id").as(idCol), col("cluster"), col("component"),
        col("centroid_cos_q"), col("keep"))
  }
}
