package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`) — the beyond-parity similarity-search operator set.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k via a broadcast of the query
  *    vectors — the correctness baseline, O(corpus × queries) but one scan,
  *    no shuffle of the corpus, vector math in the native codegen'd
  *    `vec_cosine` expression (HOF twins kept for cross-checks);
  *  - [[lshTopK]]: random-hyperplane LSH (sign-of-dot-product sketch,
  *    Charikar 2002) — corpus and queries are bucketed by a `bits`-bit
  *    signature over shared random hyperplanes; only same-bucket (or
  *    probe-adjacent) pairs are scored. At 100 TB the corpus side is
  *    scanned once, bucketed by signature (narrow), and only bucket-local
  *    candidates shuffle — the classic IVF/LSH scale path.
  */
object SimilaritySearch {

  /** dot(a, b) via zip_with + aggregate — builtin HOF composition. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)

  def l2norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))

  /** HOF cosine — kept as the cross-check twin of the native expression
    * (Spark HOFs are CodegenFallback: every element round-trips through
    * interpreted lambda eval, so the hot paths use `vec_cosine`). */
  def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2norm(a) * l2norm(b)
    when(n === 0, 0.0).otherwise(d / n)
  }

  /** Native codegen'd cosine ([[graft.plans.CosineSimilarityExpression]]);
    * bit-identical to [[cosineHof]] (same accumulation order). The session
    * must carry GraftExtensions — operators register on entry. */
  def cosine(a: Column, b: Column): Column =
    graft.plans.VectorKernels.cosineNative(a, b)

  /** Exact top-k by cosine for each query vector.
    * @param corpus  (idCol, vecCol: array<float>)
    * @param queries (qidCol, vecCol) — small enough to broadcast
    * @return (query_id, id, cosine, rank) with rank 1..k per query
    */
  /** Shared ranking tail of the exact-scoring family: `score`(v, qv)
    * over the corpus × broadcast-queries product filtered by `keep`,
    * then the per-query top-k as a WindowGroupLimit (score desc, id
    * tiebreak). One body so a ranking/tie-break change cannot silently
    * diverge between [[bruteForceTopK]], [[hardNegatives]] and
    * [[mipsTopK]]. */
  private def rankTopK(c: DataFrame, q: DataFrame, keep: Column, k: Int,
      outCols: Seq[String], scoreName: String = "cosine",
      score: (Column, Column) => Column = cosine): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = c.join(broadcast(q))
      .where(keep)
      .withColumn(scoreName, score(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col(scoreName).desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(outCols.map(col): _*)
  }

  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    rankTopK(c, q, col("id") =!= col("query_id"), k,
      Seq("query_id", "id", "cosine", "rank"))
  }

  /** Hard-negative mining for contrastive training (the DPR/Contriever
    * data-prep step): per anchor, the `k` most-similar corpus vectors
    * whose LABEL differs from the anchor's — similar enough to be hard,
    * labeled differently so they are negatives. Exactly the
    * [[bruteForceTopK]] plan (corpus scan × broadcast anchors →
    * per-anchor WindowGroupLimit) with the label-mismatch predicate as
    * the keep condition; at corpus scale the candidate generation swaps
    * to the IVF/LSH buckets the ANN family already provides — the
    * ranking stage is identical. No id-inequality predicate on purpose:
    * an in-corpus anchor's own row shares its label and is excluded by
    * the mismatch test, while an EXTERNAL anchor set may collide with
    * corpus ids coincidentally — an id check would silently drop those
    * legitimate negatives. Returns (query_id, id, neg_label, cosine,
    * rank). */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"),
      col(labelCol).as("neg_label"),
      col(vecCol).cast("array<double>").as("v"))
    val q = anchors.select(col(idCol).as("query_id"),
      col(labelCol).as("_qlabel"),
      col(vecCol).cast("array<double>").as("qv"))
    rankTopK(c, q, col("neg_label") =!= col("_qlabel"), k,
      Seq("query_id", "id", "neg_label", "cosine", "rank"))
  }

  /** Exact maximum-inner-product top-k (MIPS): the ranking a trained
    * dot-product retriever serves (DPR/ANCE-style models score q·x, NOT
    * cosine — the document norm carries trained signal, so the two
    * orderings genuinely differ; MipsSpec demonstrates the divergence).
    * Same corpus-scan × broadcast-queries → WindowGroupLimit shape as
    * [[bruteForceTopK]]; the score is the codegen'd native `vec_dot`.
    * Returns (query_id, id, dot, rank). Scale path: [[mipsAlshTopK]]. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    rankTopK(c, q, col("id") =!= col("query_id"), k,
      Seq("query_id", "id", "dot", "rank"), "dot",
      graft.plans.VectorKernels.dotNative)
  }

  /** Σ floor(x·1e6)² as pure integers — the quantized norm² the portable
    * ALSH transform keys on (order-independent, so engine-exact). */
  private[operators] def quantNorm2(v: Column): Column =
    aggregate(transform(v, x => {
      val q = floor(x * lit(1e6)).cast("long")
      q * q
    }), lit(0L), (s, t) => s + t)

  /** Portable ALSH corpus-side signature: [[lshSignaturePortableKernel]]
    * over the quantized vector AUGMENTED with one extra dimension
    * aq = floor(sqrt(max(m2q − Σq², 0))) at hash index n, where m2q is
    * the corpus max of the quantized norm². All projections stay exact
    * integers, so a SQL oracle replays the bucket bit-for-bit (the
    * q_ann_lsh discipline). The QUERY side appends 0, which contributes
    * nothing to any projection — its bucket equals the plain
    * [[lshSignaturePortableKernel]] signature (that asymmetry is the
    * whole trick; MipsSpec pins the identity). */
  def alshCorpusPortableKernel(v: Seq[Double], bits: Int,
      m2q: Long): Long = {
    if (v == null || v.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = v.length
    val q = new Array[Long](n + 1)
    val h = new Array[Long](n + 1)
    var j = 0
    var norm2 = 0L
    while (j < n) {
      q(j) = math.floor(v(j) * 1e6).toLong
      norm2 += q(j) * q(j)
      h(j) = Dedup.hash64Md5(md, j.toString)
      j += 1
    }
    q(n) = math.floor(math.sqrt(math.max(m2q - norm2, 0L).toDouble)).toLong
    h(n) = Dedup.hash64Md5(md, n.toString)
    var sig = 0L
    var p = 0
    while (p < bits) {
      var proj = 0L
      var i = 0
      while (i <= n) {
        proj += (if (((h(i) >>> p) & 1L) != 0L) q(i) else -q(i))
        i += 1
      }
      if (proj >= 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }

  private val alshCorpusUdf = udf(alshCorpusPortableKernel _)

  /** ALSH scale path for MIPS (Shrivastava & Li 2014, "Asymmetric LSH
    * for sublinear time Maximum Inner Product Search"): no symmetric LSH
    * family exists for raw inner product (a vector need not be its own
    * nearest neighbor), but an ASYMMETRIC transform pair reduces MIPS to
    * cosine search — append sqrt(M² − ‖x‖²) to every corpus vector
    * (M = max corpus norm; ONE scalar agg broadcast back, zero extra
    * shuffle) and 0 to every query. Every augmented corpus vector then
    * has norm exactly M, so per query cos(aug(x), aug(q)) =
    * (x·q)/(M·‖q‖) is monotone in x·q — the existing random-hyperplane
    * bucketing answers MIPS unchanged. Candidates re-rank by EXACT
    * native dot (LSH buys recall, never scores). At 100 TB this is the
    * same bucket-join shape as [[lshTopK]]: corpus-side narrow map +
    * one broadcast-bucket join, no all-pairs stage.
    * `portableBuckets = true` swaps in the integer-Rademacher signature
    * ([[alshCorpusPortableKernel]]) so the bucket assignment — and hence
    * the whole approximate result — is SQL-oracle-replayable.
    * Returns (query_id, id, dot, rank). */
  def mipsAlshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      bits: Int = 6, portableBuckets: Boolean = false): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val dotN = graft.plans.VectorKernels.dotNative _
    val c0 = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val q0 = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val (c, q) =
      if (portableBuckets) {
        val m2 = c0.agg(max(quantNorm2(col("v"))).as("m2q"))
        val cb = c0.crossJoin(broadcast(m2))
          .withColumn("bucket",
            alshCorpusUdf(col("v"), lit(bits), col("m2q")))
        (cb, q0.withColumn("bucket", lshSignaturePortable(col("qv"), bits)))
      } else {
        val m2 = c0.agg(max(dotN(col("v"), col("v"))).as("m2"))
        val cb = c0.crossJoin(broadcast(m2))
          .withColumn("va", concat(col("v"), array(
            sqrt(greatest(col("m2") - dotN(col("v"), col("v")), lit(0.0))))))
          .withColumn("bucket", lshSignature(col("va"), bits))
        val qb = q0
          .withColumn("qa", concat(col("qv"), array(lit(0.0))))
          .withColumn("bucket", lshSignature(col("qa"), bits))
        (cb, qb)
      }
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= col("query_id"))
      .withColumn("dot", dotN(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("dot").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "dot", "rank")
  }

  /** Per-hyperplane agreement probability for a pair at `cosine`:
    * p = 1 − θ/π, the sign-sketch collision probability (Charikar
    * 2002). Driver math, no Spark. */
  def hyperplaneAgreeProbability(cosine: Double): Double = {
    require(cosine >= -1 && cosine <= 1, s"cosine $cosine outside [-1,1]")
    1.0 - math.acos(cosine) / math.Pi
  }

  /** Probability that a banded hyperplane scheme catches a pair at
    * `cosine`: 1 − (1 − p^bits)^bands — [[Dedup.lshCatchProbability]]'s
    * S-curve with the hyperplane agreement probability in place of
    * Jaccard. bands = 1 is the single-table ([[lshTopK]] /
    * [[mipsAlshTopK]]) recall. */
  def hyperplaneCatchProbability(cosine: Double, bits: Int,
      bands: Int): Double = {
    require(bits >= 1 && bands >= 1, "bits/bands must be >= 1")
    val p = hyperplaneAgreeProbability(cosine)
    1.0 - math.pow(1.0 - math.pow(p, bits), bands)
  }

  /** Pick (bits, bands) for the banded hyperplane family
    * ([[graft.operators.Bitext.mine]]'s `bits = Some(b)` path) from the
    * CORPUS SIZES and a recall budget — the [[Dedup.lshPlanFor]]
    * S-curve planner for sign sketches. The r11 lesson this codifies:
    * a fixed band grid that is fine at one corpus size floods (or
    * starves) at 10× — q_bitext_banded's 64-bucket grid measured 4.8×
    * at 10× — so the grid must be derived from the data.
    *
    * Feasible plans meet catch(targetCosine) ≥ `minCatch` within the
    * `sigBudgetBits`-bit packed signature, with expected
    * background-pair candidates per source row
    * (bands · p₀^bits · nB, p₀ = agreement at `backgroundCosine`)
    * capped by `maxCandidatesPerRow`. Among them, minimize the real
    * work model
    *
    *   cost = bands · (nA + nB)              (banding/explode rows)
    *        + bands · p₀^bits · nA · nB      (candidate verifications)
    *
    * — which is what makes the answer corpus-size-dependent: small
    * corpora prefer few cheap bands, large corpora buy more bits (and
    * the bands recall demands) to keep the quadratic term down. Ties
    * break toward fewer bands, then fewer bits. Returns None when no
    * plan fits — at ~10⁹-row corpora a 64-bit signature genuinely
    * cannot deliver high recall at sane candidate rates; widen the
    * signature (multiple longs) or relax the budget, but do not let a
    * planner silently pick a flooding grid.
    *
    * The arithmetic is replayed verbatim by the q_bitext_planned SQL
    * oracle (same cost expression, same tie-break order), so keep any
    * edit to the formula in sync with that CTE. `backgroundCosine = 0`
    * keeps p₀ exactly 0.5 in BOTH engines (acos(0) is π/2 in the same
    * doubles), making the COST column — integer·2⁻ᵇ products — bit-
    * identical. The FEASIBILITY filter is weaker: it evaluates
    * acos(targetCosine) through each engine's libm (JVM vs C, neither
    * guaranteed correctly rounded), so a grid whose catch probability
    * sits within ~1 ulp of `minCatch` could in principle be feasible
    * on one engine only; with fixed planner constants that boundary
    * coincidence is measure-zero, and the oracle gate would surface
    * it as a loud hash mismatch, not silent drift. */
  def hyperplanePlanFor(targetCosine: Double, nA: Long, nB: Long,
      minCatch: Double = 0.95, backgroundCosine: Double = 0.0,
      sigBudgetBits: Int = 64,
      maxCandidatesPerRow: Double = 1024.0): Option[(Int, Int)] = {
    require(nA >= 1 && nB >= 1, s"corpus sizes ($nA, $nB) must be >= 1")
    require(minCatch > 0 && minCatch < 1,
      s"minCatch $minCatch outside (0,1)")
    require(sigBudgetBits >= 1 && sigBudgetBits <= 64,
      s"sigBudgetBits $sigBudgetBits outside [1,64]")
    val p0 = hyperplaneAgreeProbability(backgroundCosine)
    val feasible = for {
      bits <- 1 to sigBudgetBits
      bands <- 1 to sigBudgetBits / bits
      if hyperplaneCatchProbability(targetCosine, bits, bands) >= minCatch
      if bands * math.pow(p0, bits) * nB <= maxCandidatesPerRow
    } yield {
      val cost = bands.toDouble * (nA + nB) +
        bands * math.pow(p0, bits) * nA * nB
      (cost, bands, bits)
    }
    feasible.sorted.headOption.map { case (_, bands, bits) =>
      (bits, bands)
    }
  }

  /** Single-table bucket-width planner for the [[mipsAlshTopK]] /
    * [[lshTopK]] family: the SMALLEST `bits` keeping the expected
    * same-bucket background candidates per query
    * (corpusRows · 0.5^bits) at or below `targetCandidatesPerQuery`.
    * Smallest, because every extra bit halves single-table recall
    * (catch = p^bits with no OR-amplification — see
    * [[hyperplaneCatchProbability]] at bands = 1); the caller buys
    * exactly the bucket thinning the corpus size forces and no more.
    * Exact powers of two on both engines, so the SQL twin (smallest
    * bits with n · pow(0.5, bits) ≤ target) agrees bit for bit. */
  def alshBitsFor(corpusRows: Long,
      targetCandidatesPerQuery: Double = 64.0): Int = {
    require(corpusRows >= 1, s"corpusRows $corpusRows must be >= 1")
    require(targetCandidatesPerQuery >= 1,
      s"targetCandidatesPerQuery $targetCandidatesPerQuery must be >= 1")
    var bits = 1
    while (bits < 62 &&
        corpusRows * math.pow(0.5, bits) > targetCandidatesPerQuery)
      bits += 1
    bits
  }

  /** [[mipsAlshTopK]] with `bits` chosen by [[alshBitsFor]] from the
    * REAL corpus row count (one count action at plan-construction
    * time — the sizing convention of [[Tokenizer.joinByWord]]). */
  def mipsAlshTopKPlanned(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      targetCandidatesPerQuery: Double = 64.0,
      portableBuckets: Boolean = false): DataFrame =
    mipsAlshTopK(corpus, queries, idCol, vecCol, qidCol, k,
      bits = alshBitsFor(corpus.count(), targetCandidatesPerQuery),
      portableBuckets = portableBuckets)

  /** Deterministic pseudo-random hyperplanes: component j of plane p is a
    * hash-derived value in [-1, 1). Shared by corpus and queries without
    * shipping any state. */
  private def planeComponent(p: Int, j: Column): Column =
    (pmod(xxhash64(lit(p), j), lit(1000000)).cast("double") / 500000.0) - 1.0

  /** HOF signature — cross-check twin of the native expression: `bits`
    * interpreted array walks per row (CodegenFallback), kept only so the
    * spec can pin native == HOF. */
  def lshSignatureHof(vec: Column, bits: Int): Column =
    (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x * planeComponent(p, j)),
        lit(0.0), (s, v) => s + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** `bits`-bit random-hyperplane signature — native codegen'd expression
    * ([[graft.plans.LshSignatureExpression]]), one static call per row,
    * same xxhash stream as [[lshSignatureHof]]. */
  def lshSignature(vec: Column, bits: Int): Column =
    graft.plans.VectorKernels.lshSignatureNative(vec, bits)

  /** PORTABLE bucket signature (oracle-checked verification path): the
    * vector is quantized to exact integers (`floor(x·1e6)`) and projected
    * onto Rademacher ±1 hyperplanes whose signs are bit p of the
    * md5-derived per-dimension hash ([[Dedup.hash64Md5]] == DuckDB
    * `md5_number_upper`). Projections are integer sums, so the bucket is
    * bit-identical in ANY engine regardless of summation order — no
    * float sign ties — which is what makes the q_ann_lsh SQL oracle
    * exact. Still a valid sign-of-projection cosine LSH family
    * (quantization at 1e-6 is immaterial to the geometry); the xxhash
    * plane path stays the production default. bits <= 64. */
  def lshSignaturePortableKernel(v: Seq[Double], bits: Int): Long = {
    if (v == null || v.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = v.length
    val q = new Array[Long](n)
    val h = new Array[Long](n)
    var j = 0
    while (j < n) {
      q(j) = math.floor(v(j) * 1e6).toLong
      h(j) = Dedup.hash64Md5(md, j.toString)
      j += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) {
      var proj = 0L
      var i = 0
      while (i < n) {
        proj += (if (((h(i) >>> p) & 1L) != 0L) q(i) else -q(i))
        i += 1
      }
      if (proj >= 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }

  private val lshPortableUdf = udf(lshSignaturePortableKernel _)

  def lshSignaturePortable(vec: Column, bits: Int): Column =
    lshPortableUdf(vec, lit(bits))

  /** IVF-style ANN: a coarse k-means quantizer (MLlib) partitions the
    * corpus into `nlist` cells; each query scores only the corpus rows in
    * its `nprobe` nearest cells. This is the inverted-file layout of
    * FAISS-style systems expressed relationally: the cell assignment is a
    * narrow map over the corpus, candidate scoring shuffles only the
    * probed cells. Recall/cost trades on nprobe.
    */
  /** Deterministic Lloyd's k-means over a driver-side training sample —
    * the IVF coarse quantizer. Training on a bounded hash-sample is the
    * standard FAISS practice (the quantizer needs cluster SHAPE, not every
    * point), keeps the driver math O(sample · nlist · dim), and avoids an
    * MLlib dependency whose Kryo serialization of vector task results
    * proved fragile at high local parallelism. */
  /** Shared squared-distance kernel for quantizer train/assign/probe. */
  @inline private[operators] def sqDist(a: Array[Double],
      b: Array[Double]): Double = {
    var d = 0.0; var j = 0
    while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
    d
  }
  @inline private def sqDist(a: Array[Double], b: Seq[Double]): Double = {
    var d = 0.0; var j = 0
    while (j < a.length) { val t = a(j) - b(j); d += t * t; j += 1 }
    d
  }

  /** Bounded deterministic training sample (hash-filter then id-ordered
    * take — stable across partitioning/parallelism) → coarse quantizer.
    * The ONE training body shared by [[ivfTopK]] and the persisted
    * [[AnnIndex]], so a live query and a built index can never train
    * different quantizers from the same inputs. Expects columns
    * (id, v: array<double>). */
  private[operators] def trainOnSample(c: DataFrame, nlist: Int,
      seed: Long, maxTrain: Int): Array[Array[Double]] = {
    val corpusN = c.count()
    val every = math.max(1L, corpusN / maxTrain)
    val sample = c
      .where(pmod(xxhash64(col("id")), lit(every)) === 0)
      .orderBy("id")
      .limit(maxTrain)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    trainCentroids(sample, nlist, iters = 20, seed = seed)
  }

  private[operators] def trainCentroids(points: Array[Array[Double]],
      nlist: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs a non-empty training sample")
    val rnd = new scala.util.Random(seed)
    val dim = points(0).length
    val k = math.min(nlist, points.length)
    // DISTINCT seeded indices: a with-replacement draw can duplicate a
    // center, and the duplicate (tie-broken to the lower index) would
    // never attract points — a permanently dead cell
    val centers = rnd.shuffle(points.indices.toVector).take(k)
      .map(points(_).clone()).toArray
    def nearest(p: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val d = sqDist(centers(c), p)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Double](k, dim)
      val counts = new Array[Long](k)
      points.foreach { p =>
        val c = nearest(p)
        counts(c) += 1
        var j = 0
        while (j < dim) { sums(c)(j) += p(j); j += 1 }
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < dim) { centers(c)(j) = sums(c)(j) / counts(c); j += 1 }
        } // empty cell keeps its previous center (deterministic)
        c += 1
      }
      it += 1
    }
    centers
  }

  /** `trainedCentroids`: pre-trained coarse centroids (e.g. a full-corpus
    * [[KMeans.train]] + [[KMeans.dequantize]]) — when given, the bounded
    * driver-sample training path is skipped entirely. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42,
      maxTrain: Int = 50000,
      trainedCentroids: Option[Array[Array[Double]]] = None): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    import org.apache.spark.sql.expressions.Window

    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))

    val centroids = trainedCentroids.getOrElse(
      trainOnSample(c, nlist, seed, maxTrain)).zipWithIndex

    // cell assignment == probing with nprobe=1: one ranked-cells kernel
    def nearestCells(v: Seq[Double], n: Int): Seq[Int] =
      centroids.map { case (ctr, i) => (i, sqDist(ctr, v)) }
        .sortBy(_._2).take(n).map(_._1).toSeq
    val cellUdf = udf { (v: Seq[Double]) => nearestCells(v, 1).head }
    val assigned = c.withColumn("cell", cellUdf(col("v")))

    // query → its nprobe nearest centroids (centroids are tiny, driver math)
    val q = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probeUdf = udf { (qv: Seq[Double]) => nearestCells(qv, nprobe) }
    val probed = q.withColumn("cell", explode(probeUdf(col("qv"))))

    val scored = assigned.join(broadcast(probed), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** Bucketed ANN: score only same-signature candidates, then top-k.
    * Recall/cost trades on `bits` (fewer bits → bigger buckets → higher
    * recall, more work). */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      bits: Int = 12, portableBuckets: Boolean = false): DataFrame = {
    graft.plans.GraftExtensions.register(corpus.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val bucketOf: Column => Column =
      if (portableBuckets) lshSignaturePortable(_, bits)
      else lshSignature(_, bits)
    val c = corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", bucketOf(col("v")))
    val q = queries.select(col(qidCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", bucketOf(col("qv")))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("id") =!= col("query_id"))
      .withColumn("cosine", cosine(col("v"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "cosine", "rank")
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid 2011, "Product
    * Quantization for Nearest Neighbor Search"): the embedding splits
    * into `m` subspaces, each with its own `ksub`-centroid codebook
    * (k-means over the bounded deterministic sample, seed + subspace
    * index), a vector encodes as `m` small codes, and queries rank
    * candidates by ADC — the sum of per-subspace distances from the
    * query sub-vector to each candidate's reconstructed centroid. This
    * is the memory-bound ANN scale path: the corpus compresses ~dim·8/m
    * bytes → m bytes per vector, encode is a narrow kernel under
    * broadcast codebooks, and scoring never touches the original
    * vectors. (Compose with [[ivfTopK]]'s cell routing for IVFADC; this
    * operator is the exhaustive-ADC variant that pins the quantizer.)
    *
    * Vectors are unit-normalized ([[unitNorm]]) before training,
    * encoding, and scoring, so the L2 ADC ordering equals the cosine
    * ordering the other ANN operators rank by.
    *
    * Determinism: codebooks are seeded and sample-order-stable (the
    * [[ivfTopK]] discipline); assignment ties break to the lowest cell;
    * each per-subspace ADC contribution is floor-quantized to 1e-9
    * integers so the cross-subspace sum commutes and replays exactly in
    * SQL (adc_q9 = Σ_m floor(d_m · 1e9)).
    *
    * Returns (query_id, id, rank, adc_q9). */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      m: Int = 8, ksub: Int = 16, seed: Long = 42,
      maxTrain: Int = 50000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val corpusN = c.count()
    val every = math.max(1L, corpusN / maxTrain)
    val sample = c
      .where(pmod(xxhash64(col("id")), lit(every)) === 0)
      .orderBy("id")
      .limit(maxTrain)
      .select("v").collect()
      .map(r => unitNorm(r.getSeq[Double](0)))
    val codebooks = trainPqCodebooks(sample, m, ksub, seed)

    val encodeUdf = udf((v: Seq[Double]) => {
      val n = unitNorm(v)
      Array.tabulate(m)(mi => pqNearestCell(codebooks, n, mi))
    })
    // per-pair ADC over the codes: m quantized lookups, ascending
    // subspace order (matches the SQL replay's integer sum)
    val adcUdf = udf((codes: Seq[Int], qv: Seq[Double]) => {
      val n = unitNorm(qv)
      var s = 0L; var mi = 0
      while (mi < m) {
        s += math.floor(pqSubDist(n, mi, codebooks(mi)(codes(mi))) * 1e9)
          .toLong
        mi += 1
      }
      s
    })
    val encoded = c.withColumn("codes", encodeUdf(col("v"))).drop("v")
    val q = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_q9").asc, col("id"))
    encoded.join(broadcast(q), col("id") =!= col("query_id"))
      .withColumn("adc_q9", adcUdf(col("codes"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "rank", "adc_q9")
  }

  /** Squared L2 between a PQ sub-centroid and sub-vector `mi` of `v`
    * (ascending-index accumulation — the exact arithmetic the SQL
    * oracles replay). Shared by [[pqTopK]] and [[ivfPqTopK]]. */
  private[operators] def pqSubDist(v: Seq[Double], mi: Int,
      ctr: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < ctr.length) {
      val t = ctr(j) - v(mi * ctr.length + j); s += t * t; j += 1
    }
    s
  }

  /** Nearest sub-codebook cell for sub-vector `mi` of `v`; ties break
    * to the lowest cell (the oracle's (dist, cell) row_number order). */
  private[operators] def pqNearestCell(
      codebooks: Array[Array[Array[Double]]], v: Seq[Double],
      mi: Int): Int = {
    val cb = codebooks(mi)
    var best = 0; var bestD = Double.MaxValue
    var cell = 0
    while (cell < cb.length) {
      val dd = pqSubDist(v, mi, cb(cell))
      if (dd < bestD) { bestD = dd; best = cell }
      cell += 1
    }
    best
  }

  /** IVF-PQ ANN (IVFADC, Jégou et al. 2011 §V): [[ivfTopK]]'s coarse
    * cell routing composed with [[pqTopK]]'s quantized ADC scoring —
    * the standard FAISS pairing that makes PQ ranking probe-bucket
    * sized instead of corpus-sized. Each corpus vector stores only
    * (cell, m codes); a query ADC-ranks just the candidates in its
    * `nprobe` nearest cells under broadcast codebooks, so at 100 TB the
    * scoring work is nprobe/nlist of the corpus and the shuffled state
    * is a few bytes per vector.
    *
    * `byResidual = false` (default) quantizes the vector itself —
    * FAISS's `by_residual=false` mode, whose sub-codebooks are
    * identical to [[pqTopK]]'s (same inputs, same seed chain).
    * `byResidual = true` is the paper's full IVFADC: codes quantize
    * the residual v − centroid(cell), which concentrates the codebook's
    * dynamic range on the within-cell offsets; the query's ADC then
    * scores against its PER-PROBED-CELL residual q − centroid(cell)
    * under its own pinned residual codebooks.
    *
    * Everything runs on the unit sphere ([[unitNorm]]) so ADC ordering
    * equals cosine ordering; unlike [[ivfTopK]] the coarse centroids
    * are trained on UNIT vectors, letting one normalize serve routing
    * and coding. Same determinism discipline as [[pqTopK]]: bounded
    * hash-sampled id-ordered training set, coarse k-means seeded
    * `seed`, sub-codebooks `seed + mi`; ties to the lowest cell; ADC
    * contributions floor-quantized to 1e-9 integers (`adc_q9`).
    *
    * Returns (query_id, id, rank, adc_q9). */
  /** `trainedCoarse`: pre-trained coarse centroids in UNIT-vector space
    * (e.g. full-corpus [[KMeans.train]] over unit-normalized vectors +
    * [[KMeans.dequantize]]) — replaces the bounded-sample coarse
    * training; the PQ sub-codebooks still train on the local sample. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qidCol: String, k: Int,
      nlist: Int = 8, nprobe: Int = 4, m: Int = 16, ksub: Int = 16,
      seed: Long = 42, maxTrain: Int = 50000,
      byResidual: Boolean = false,
      trainedCoarse: Option[Array[Array[Double]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val corpusN = c.count()
    val every = math.max(1L, corpusN / maxTrain)
    val sample = c
      .where(pmod(xxhash64(col("id")), lit(every)) === 0)
      .orderBy("id")
      .limit(maxTrain)
      .select("v").collect()
      .map(r => unitNorm(r.getSeq[Double](0)))
    val coarse = trainedCoarse.getOrElse(
      trainCentroids(sample, nlist, iters = 20, seed = seed))

    // ranked coarse cells of a unit vector; stable sort keeps ascending
    // cell on ties (== the oracle's (dist, cell) order)
    def nearestCoarse(n: Array[Double], take: Int): Seq[Int] =
      coarse.zipWithIndex.map { case (ctr, i) => (i, sqDist(ctr, n)) }
        .sortBy(_._2).take(take).map(_._1).toSeq
    def residual(n: Array[Double], cell: Int): Array[Double] = {
      val ctr = coarse(cell)
      Array.tabulate(n.length)(j => n(j) - ctr(j))
    }

    // residual mode trains the sub-codebooks on the sample's residuals
    // (paper IVFADC); plain mode on the unit vectors (== pqTopK's books)
    val codebooks =
      if (byResidual)
        trainPqCodebooks(
          sample.map(n => residual(n, nearestCoarse(n, 1).head)),
          m, ksub, seed)
      else trainPqCodebooks(sample, m, ksub, seed)

    // one normalize pass serves cell routing AND code assignment
    val encodeUdf = udf((v: Seq[Double]) => {
      val n = unitNorm(v)
      val cell = nearestCoarse(n, 1).head
      val coded: Seq[Double] = if (byResidual) residual(n, cell) else n
      (cell, Array.tabulate(m)(mi => pqNearestCell(codebooks, coded, mi)))
    })
    val encoded = c.withColumn("e", encodeUdf(col("v")))
      .select(col("id"), col("e._1").as("cell"), col("e._2").as("codes"))
    val q = queries.select(col(qidCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val probeUdf = udf((qv: Seq[Double]) =>
      nearestCoarse(unitNorm(qv), nprobe))
    val probed = q.withColumn("cell", explode(probeUdf(col("qv"))))
    // residual ADC scores against the query's PER-PROBED-CELL residual
    val adcUdf = udf((codes: Seq[Int], qv: Seq[Double], cell: Int) => {
      val n = unitNorm(qv)
      val scored: Seq[Double] = if (byResidual) residual(n, cell) else n
      var s = 0L; var mi = 0
      while (mi < m) {
        s += math.floor(pqSubDist(scored, mi, codebooks(mi)(codes(mi)))
          * 1e9).toLong
        mi += 1
      }
      s
    })
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_q9").asc, col("id"))
    encoded.join(broadcast(probed), Seq("cell"))
      .where(col("id") =!= col("query_id"))
      .withColumn("adc_q9", adcUdf(col("codes"), col("qv"), col("cell")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "id", "rank", "adc_q9")
  }

  /** Unit-normalize a vector (ascending-index square sum, one sqrt, one
    * division per element — the exact arithmetic the SQL oracle
    * replays). PQ trains, encodes, and scores on the unit sphere so its
    * L2 ADC ordering equals the cosine ordering of the exact baseline. */
  private[operators] def unitNorm(v: Seq[Double]): Array[Double] = {
    var s = 0.0; var j = 0
    while (j < v.length) { s += v(j) * v(j); j += 1 }
    val n = math.sqrt(s)
    val out = new Array[Double](v.length)
    j = 0
    while (j < v.length) { out(j) = v(j) / n; j += 1 }
    out
  }

  /** Per-subspace PQ codebooks: `m` independent k-means runs over the
    * sample's sub-vectors, seeded `seed + subspace` — deterministic and
    * replayable by the oracle generator. */
  private[operators] def trainPqCodebooks(sample: Array[Array[Double]],
      m: Int, ksub: Int, seed: Long): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "PQ needs a non-empty training sample")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
    val d = dim / m
    Array.tabulate(m) { mi =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, mi * d,
        (mi + 1) * d))
      trainCentroids(sub, ksub, iters = 20, seed = seed + mi)
    }
  }

  /** PCA dimensionality reduction of an embedding column — the standard
    * preprocessing of the SemDeDup/embedding-clustering pipelines (reduce
    * 1k-dim embeddings to the top-k variance directions before the
    * O(dim) cosine work). MLlib's distributed PCA: covariance accumulates
    * via a treeAggregate over the cluster, the small k×dim basis ships
    * back broadcast, and projection is a narrow per-row matrix-vector
    * product — no corpus shuffle anywhere. Returns (idCol, `pca` =
    * array<double> of length k). */
  def pcaReduce(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val prepped = df.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("_v"))
    val model = new PCA().setInputCol("_v").setOutputCol("_p").setK(k)
      .fit(prepped)
    model.transform(prepped)
      .select(col(idCol), vector_to_array(col("_p")).as("pca"))
  }

  /** Johnson–Lindenstrauss random projection (the ±1 variant of
    * Achlioptas 2003, "Database-friendly random projections"):
    * project a fixed-dim embedding column to `k` dims through a
    * DETERMINISTIC ±1 sign matrix derived from the portable md5 stream.
    * The training-free alternative to [[pcaReduce]] — at 100 TB there
    * is no covariance pass, no model: the d·k matrix is computed ONCE
    * on the driver ([[graft.functions.Hashing.md5Long56Local]], ~1k
    * hashes) and embedded as a literal, and projection is one narrow
    * row-local pass. Zero shuffle, zero per-row hashing.
    *
    * Engine-exact by construction: components quantize to 1e-6 grain
    * BEFORE the signed sum, so each output component is an exact
    * integer Σ ±xqᵢ — the SQL oracle replays the sign bits via
    * `md5_number_upper % 2` and sums the same integers. Output rows
    * (idCol, out_dim 0..k−1, comp_q6, value = comp_q6/(10⁶·√k)) —
    * exploded, because array columns cannot cross the driver gate. */
  def jlReduce(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, salt: String = "jl|"): DataFrame = {
    import graft.functions.Hashing
    require(k > 0, s"k must be positive: $k")
    // bounded driver scalar (the IVF-sample discipline): the input dim.
    // min==max is REQUIRED — a ragged corpus would make element_at read
    // past the short vectors and silently null entire projections
    val dims = df.agg(max(size(col(vecCol))).as("dmax"),
      min(size(col(vecCol))).as("dmin")).head()
    require(!dims.isNullAt(0), "jlReduce: empty input frame")
    val d = dims.getInt(0)
    require(d > 0, "jlReduce: empty vectors")
    require(dims.getInt(1) == d,
      s"jlReduce requires fixed-dimension vectors (saw ${dims.getInt(1)} and $d)")
    val signs: Seq[Seq[Long]] = (0 until k).map { j =>
      (0 until d).map { i =>
        if (Hashing.md5Long56Local(s"$salt$i|$j") % 2 == 0) 1L else -1L
      }
    }
    val signsLit = typedLit(signs)
    val scale = 1000000.0 * math.sqrt(k.toDouble)
    df.select(col(idCol),
        transform(col(vecCol),
          v => round(v.cast("double") * 1000000).cast("long")).as("_xq"))
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), lit(k - 1)),
        j => aggregate(sequence(lit(0), lit(d - 1)), lit(0L),
          (acc, i) => acc + element_at(col("_xq"), (i + 1).cast("int")) *
            element_at(element_at(signsLit, (j + 1).cast("int")),
              (i + 1).cast("int"))))))
      .withColumnRenamed("pos", "out_dim")
      .withColumnRenamed("col", "comp_q6")
      // NO round(): comp_q6/4e6 lands on a decimal .5 boundary for
      // every comp ≡ 2 (mod 4) and the two engines' round() disagree
      // there (Spark rounds the shortest decimal rendering, DuckDB the
      // raw binary). The bare division of identical integers by an
      // identical constant is already the same IEEE double on both.
      .withColumn("value", col("comp_q6") / scale)
  }

  /** Maximal-marginal-relevance diversified re-rank (Carbonell &
    * Goldstein 1998): per query, greedily pick
    * argmax λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s) over a bounded
    * candidate pool — the standard retrieval-diversification step
    * between ANN candidate generation and the consumer.
    *
    * Exactness: vectors quantize to floor(x·10³) Longs; rel and all
    * pairwise sims are integer dots and λ is ppm-scaled, so scores are
    * exact BIGINTs and the greedy argmax (score desc, id asc) is
    * engine-stable — the DuckDB twin replays the whole recursion.
    * Long bound: |score| ≤ 10⁶ · dim · (10³·|x|ₘₐₓ)² — safe to
    * |x|ₘₐₓ ≈ 95 at dim 64, far beyond any normalized embedding.
    *
    * Shape at 100 TB: candidate generation is the [[bruteForceTopK]]
    * scan shape (corpus × broadcast queries, WindowGroupLimit top-N; at
    * scale the IVF/LSH bucket pools substitute); the greedy kernel runs
    * per query over ≤ `candidates` rows — O(k·N) sims of bounded state,
    * never corpus-sized. One window shuffle, one groupByKey shuffle of
    * N·queries candidate rows.
    *
    * @return (query_id, pick_rank, id, mmr_score) — rank
    *         1..min(k, distinct ids); duplicate (id, vec) corpus rows
    *         are picked at most once (id-based exclusion, matching the
    *         oracle's NOT list_contains(chosen, id)) */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, qidCol: String, k: Int = 8, candidates: Int = 20,
      lambdaPpm: Long = 700000L): DataFrame = {
    require(k >= 1 && candidates >= k, s"need candidates >= k >= 1")
    require(lambdaPpm >= 0 && lambdaPpm <= 1000000L,
      s"lambdaPpm=$lambdaPpm outside [0, 1e6]")
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    import spark.implicits._
    def quant(c: Column) = transform(c.cast("array<double>"),
      x => floor(x * 1000).cast("long"))
    val c = corpus.select(col(idCol).as("id"), quant(col(vecCol)).as("v"))
    val q = queries.select(col(qidCol).as("query_id"),
      quant(col(vecCol)).as("qv"))
    val idot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (s, v) => s + v)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rel").desc, col("id"))
    val cand = c.join(broadcast(q))
      .where(col("id") =!= col("query_id"))
      .withColumn("rel", idot(col("v"), col("qv")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= candidates)
      .select(col("query_id"), col("id"), col("v"), col("rel"))
      .as[(Long, Long, Array[Long], Long)]
    val mu = 1000000L - lambdaPpm
    cand.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val cs = it.toArray
      val n = cs.length
      def dotArr(a: Array[Long], b: Array[Long]): Long = {
        var s = 0L; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }; s
      }
      val picked = new Array[Boolean](n)
      // picked-ID set mirrors the oracle's id-based exclusion: a corpus
      // with duplicate (id, vec) rows must still yield distinct picks
      val pickedIds = new scala.collection.mutable.HashSet[Long]
      // running max sim of each candidate to the picked set
      val maxSim = new Array[Long](n)
      val out = new scala.collection.mutable.ArrayBuffer[
        (Long, Long, Long, Long)](math.min(k, n))
      var step = 0
      var exhausted = false
      while (step < math.min(k, n) && !exhausted) {
        var best = -1; var bestScore = Long.MinValue
        var i = 0
        while (i < n) {
          if (!picked(i) && !pickedIds.contains(cs(i)._2)) {
            val s = if (step == 0) lambdaPpm * cs(i)._4
              else lambdaPpm * cs(i)._4 - mu * maxSim(i)
            if (s > bestScore ||
                (s == bestScore && (best < 0 || cs(i)._2 < cs(best)._2))) {
              best = i; bestScore = s
            }
          }
          i += 1
        }
        if (best < 0) exhausted = true // only duplicate-id copies left
        else {
          picked(best) = true
          pickedIds += cs(best)._2
          out += ((qid, (step + 1).toLong, cs(best)._2, bestScore))
          var j = 0
          while (j < n) {
            if (!picked(j)) {
              val d = dotArr(cs(j)._3, cs(best)._3)
              if (step == 0 || d > maxSim(j)) maxSim(j) = d
            }
            j += 1
          }
          step += 1
        }
      }
      out.iterator
    }.toDF("query_id", "pick_rank", "id", "mmr_score")
  }
}
