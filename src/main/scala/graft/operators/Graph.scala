package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — the centrality rung of
  * the dedup/curation family: rank documents inside near-duplicate
  * clusters (pick the authoritative copy, not just `min(id)`), score
  * domain authority over a link graph before sampling a crawl.
  *
  * Reference scope: the reference engine has no graph operator — this
  * is part of the beyond-parity LLM-pipeline family (CommonCrawl-style
  * curation ranks hosts by harmonic/PageRank centrality before
  * selecting documents).
  */
object Graph {

  /** PageRank over an UNDIRECTED edge list `(id_a, id_b)`, computed in
    * exact integer nano-probability arithmetic so the fixpoint is
    * reproducible bit-for-bit on any engine (the repo-wide
    * quantized-integer discipline, applied to the whole iteration
    * rather than a final rounding):
    *
    *   pr₀(v)   = 10⁹ div N
    *   prₖ₊₁(v) = ((dden−dnum)·10⁹ div dden) div N
    *              + (dnum · Σ_{u∼v} prₖ(u) div deg(u)) div dden
    *
    * with every operation an integer op (div = truncating integer
    * division; all values non-negative, so truncation ≡ floor on both
    * Spark and DuckDB). The default dnum/dden = 17/20 is the classic
    * d = 0.85. Nodes are the distinct edge endpoints — every node has
    * deg ≥ 1, so there is no dangling mass; the per-division floor
    * loss (≤ N·deg nanos per iteration) is deliberate and identical
    * on every engine, which is the point: a float PageRank sums
    * contributions in partition order and no two runs agree in the
    * last ulp, while this one is a pure integer recurrence.
    *
    * Scale shape: one shuffle per iteration (the message agg keyed by
    * `dst`) plus the rank join, on an edge list persisted
    * pre-partitioned by `src` so every iteration's join reuses the
    * same exchange instead of re-shuffling the (much larger) edge
    * side. `iters` is a fixed small constant — the plan is a bounded
    * 2·iters-join tree, no lineage checkpointing needed (the
    * connected-components loop, by contrast, iterates to convergence
    * and does checkpoint).
    *
    * Returns (node, deg, pr_nanos); Σ pr_nanos ≈ 10⁹ (short by the
    * documented floor loss). */
  def pageRankNanos(edges: DataFrame, iters: Int = 5,
      dampNum: Long = 17L, dampDen: Long = 20L): DataFrame = {
    require(iters >= 0 && iters <= 50, s"iters out of range: $iters")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < $dampNum/$dampDen < 1")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges
        .select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("src"))
      .persist(lvl)
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg")).persist(lvl)
    // ONE bounded driver scalar (8 bytes — the IVF-sample discipline):
    // N is a per-iteration constant, and keeping it in-plan as a 1-row
    // broadcast cross join forced a blocking broadcast-collect job per
    // iteration (measured: 6 of them cost more than all the real
    // shuffles on a small graph). This count also populates the e/deg
    // caches eagerly in ONE job, so the iteration joins below never
    // race two plan branches into an unmaterialized cache.
    val nNodes = deg.count()
    require(nNodes > 0, "pageRankNanos: empty edge list")
    // resolution bound, not overflow: past 10⁹ nodes the integer seed
    // 10⁹/N floors to 0 and every rank collapses to the base term —
    // the nano scale is too coarse. (Sums never wrap: total mass stays
    // ≤ 10⁹ nanos by construction.) A larger graph needs a pico-scaled
    // variant (10¹² seed), which still has 6 × headroom to Long.Max.
    require(nNodes <= 1000000000L,
      s"pageRankNanos: $nNodes nodes exceeds the 10^9 nano-resolution " +
        "bound; use a coarser partition or a pico-scaled rank")
    val pr0 = 1000000000L / nNodes
    val baseNanos = (dampDen - dampNum) * 1000000000L / dampDen / nNodes
    var pr = deg.select(col("node"), col("deg"), lit(pr0).as("pr"))
    (1 to iters).foreach { _ =>
      val msgs = e
        .join(pr.select(col("node").as("src"),
          expr("pr div deg").as("contrib")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum("contrib").as("s"))
      // undirected graph: every node has an in-edge, but keep the
      // left join + coalesce so a directed edge list with sink-only
      // nodes degrades to base rank instead of dropping rows
      pr = deg
        .join(msgs, Seq("node"), "left")
        .select(col("node"), col("deg"),
          (lit(baseNanos) +
            expr(s"($dampNum * coalesce(s, 0)) div $dampDen")).as("pr"))
    }
    // Cache hygiene (the connectedComponents discipline): materialize
    // the answer once — eager localCheckpoint, node-count-sized — then
    // release the edge/degree caches before returning, so repeated
    // invocations in a long session never accumulate storage memory.
    // Callers get a flat-lineage frame that no longer references the
    // input edge frame at all (they may unpersist their own caches
    // immediately after this returns).
    val out = pr.select(col("node"), col("deg"), col("pr").as("pr_nanos"))
      .localCheckpoint()
    e.unpersist(false)
    deg.unpersist(false)
    out
  }

  /** Triangle counts + local clustering coefficient per node over an
    * undirected edge list `(id_a, id_b)` — the dedup-QA metric one
    * rung past degree: a near-dup CLUSTER from a shared template is a
    * near-clique (clustering → 1), while chained drift (A≈B≈C but
    * A≉C) shows low clustering — the two need different canonical-pick
    * policies. Exact integer output: (node, deg, n_tri,
    * clustering_ppm = 2·T·10⁶ div deg·(deg−1), 0 when deg < 2).
    *
    * Plan: canonicalize to u < v once, then ONE wedge join
    * (ab.v = bc.u) closed by ONE edge join — each triangle a < b < c
    * is found exactly once at its minimum vertex; per-node counts come
    * off a 3-way explode. All joins are keyed on node ids (8 bytes).
    * Wedge fan-out at a hub is deg²; the id-canonical orientation used
    * here is the oracle-replayable variant of the degree-ordered
    * orientation a 100 TB deployment would use to cap that fan-out
    * (order by (deg, id) instead of id — same plan shape, one extra
    * broadcast of the degree table), and the upstream minhash
    * hot-band star guard already bounds clique sizes on the dedup
    * graphs this feeds on. */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .where(col("u") =!= col("v")).distinct()
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.v") === col("bc.u"))
      .join(e.as("ac"),
        col("ab.u") === col("ac.u") && col("bc.v") === col("ac.v"))
      .select(col("ab.u").as("a"), col("ab.v").as("b"),
        col("bc.v").as("c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("_t"))
    val deg = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("_t"), lit(0L)).as("n_tri"))
      .withColumn("clustering_ppm",
        when(col("deg") >= 2,
          expr("n_tri * 2 * 1000000 div (deg * (deg - 1))"))
          .otherwise(lit(0L)))
  }

  /** Bradley–Terry pairwise-preference strengths via Hunter (2004)
    * minorization–maximization, in exact micro-unit integer arithmetic
    * (the pageRankNanos discipline): the reward-model data-prep step
    * that turns pairwise human/model preference outcomes into a global
    * item ranking.
    *
    * Per iteration: denom_i = Σ_j (n_ij·10⁹) div (p_i + p_j), then
    * p_raw = (wins_i·10⁹) div max(denom_i, 1) clamped to 10¹², then
    * mean-normalized p = max((p_raw·10⁶) div max(S div N, 1), 1) —
    * every step a positive-operand floor division, so the fixpoint is
    * engine-exact and the oracle replays all iterations. Clamp/floor
    * bounds: p_raw ≤ 10¹² keeps p_raw·10⁶ ≤ 10¹⁸ < Long.Max; the
    * per-edge term needs n_ij ≤ 9·10⁹ comparisons per pair. Two more
    * sums can wrap and are require-guarded below (the pageRankNanos
    * resolution-require convention): the driver normalization scalar
    * S = Σ p_raw ≤ N·10¹² needs N ≤ 9.2·10⁶ items, and an item's
    * denom = Σ_j term with term ≤ n_ij·5·10⁸ (p ≥ 1 each side ⇒
    * p_i + p_j ≥ 2) needs ≤ 1.8·10¹⁰ comparisons per item — both
    * checked from one agg over the persisted item table, so the guard
    * costs no extra job beyond the count the loop already needed.
    *
    * Shape at 100 TB: matches collapse to one (lo, hi) pair agg; each
    * iteration is two keyed joins of the symmetric pair table against
    * the item-strength table + one keyed agg (all co-partitionable by
    * the join key) and ONE 8-byte driver scalar (the normalization sum
    * — the CC-loop convergence-count discipline, an action per
    * iteration, never a row collect). Per-iteration frames are
    * persisted and released on exit; the result is localCheckpoint-
    * flattened like pageRankNanos.
    *
    * @param matches one row per comparison outcome (winnerCol, loserCol)
    * @return (item, wins, n_matches, strength_q6) — mean strength ≈ 10⁶ */
  def bradleyTerryQ6(matches: DataFrame, winnerCol: String,
      loserCol: String, iters: Int = 5): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val pairs = matches.select(
        least(col(winnerCol), col(loserCol)).as("lo"),
        greatest(col(winnerCol), col(loserCol)).as("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("n"))
    val sym = pairs
      .select(col("lo").as("src"), col("hi").as("dst"), col("n"))
      .unionByName(pairs
        .select(col("hi").as("src"), col("lo").as("dst"), col("n")))
      .repartition(col("src"))
      .persist(lvl)
    val wins = matches.groupBy(col(winnerCol).as("item"))
      .agg(count(lit(1)).as("wins"))
    val items = sym
      .groupBy(col("src").as("item")).agg(sum("n").as("n_matches"))
      .join(wins, Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"),
        col("n_matches"))
      .persist(lvl)
    // ONE bounded driver row outside the loop (pageRank discipline);
    // also materializes the sym/items caches eagerly in one job
    val itemStats = items
      .agg(count(lit(1)), max("n_matches")).head()
    val nItems = itemStats.getLong(0)
    require(nItems > 0, "bradleyTerryQ6: no comparisons")
    // S = Σ praw ≤ nItems·10¹² must stay < Long.Max (non-ANSI sum
    // wraps silently); 9.2·10⁶ items of pairwise-preference data is
    // far past any reward-model corpus, so this is a guard, not a cap
    require(nItems <= 9200000L,
      s"bradleyTerryQ6: $nItems items would let the normalization " +
        "sum wrap a Long (praw clamp 1e12 x n > 9.2e18)")
    // denom_i = Σ_j n_ij·10⁹ div (p_i+p_j) ≤ n_matches_i·5·10⁸
    val maxMatches = itemStats.getLong(1)
    require(maxMatches <= 18000000000L,
      s"bradleyTerryQ6: an item with $maxMatches comparisons would " +
        "let its denom sum wrap a Long (n x 5e8 > 9.2e18)")
    var p = items.select(col("item"), lit(1000000L).as("p"))
    // per-iteration localCheckpoint, not persist: the tree nests two
    // joins per round, and letting the logical plan grow made Catalyst
    // analysis dominate (measured ~5 s/iteration by round 5 on a
    // 500-edge graph); the eager checkpoint keeps plan depth constant
    // AND provides the materialization the normalization scalar reads
    var chks: List[DataFrame] = Nil
    (1 to iters).foreach { _ =>
      val denom = sym
        .join(p.select(col("item").as("src"), col("p").as("p_src")),
          Seq("src"))
        .join(p.select(col("item").as("dst"), col("p").as("p_dst")),
          Seq("dst"))
        .select(col("src").as("item"),
          expr("(n * 1000000000) div (p_src + p_dst)").as("term"))
        .groupBy("item").agg(sum("term").as("denom"))
      val raw = items.join(denom, Seq("item"), "left")
        .select(col("item"),
          least(expr(
            "(wins * 1000000000) div greatest(coalesce(denom, 0), 1)"),
            lit(1000000000000L)).as("praw"))
        .localCheckpoint()
      chks = raw :: chks
      // the per-iteration 8-byte normalization scalar (never rows)
      val s = raw.agg(sum("praw")).head().getLong(0)
      val mean = math.max(s / nItems, 1L)
      p = raw.select(col("item"),
        greatest(expr(s"(praw * 1000000) div $mean"), lit(1L)).as("p"))
    }
    val out = items.join(p, Seq("item"))
      .select(col("item"), col("wins"), col("n_matches"),
        col("p").as("strength_q6"))
      .localCheckpoint()
    // release every intermediate checkpoint's backing blocks; `out` is
    // flat and owns the only surviving blocks (Caches.releaseResult
    // frees those once the caller is done)
    chks.foreach(Caches.releaseResult)
    sym.unpersist(false)
    items.unpersist(false)
    out
  }

  /** Synchronous label propagation (Raghavan 2007) over an UNDIRECTED
    * edge list `(id_a, id_b)`, made deterministic: labels start as the
    * node id, and each round every node adopts the most frequent label
    * among its NEIGHBORS, ties broken by the smallest label. Where
    * [[graft.operators.Dedup.connectedComponents]] answers "which docs
    * are transitively linked at all", LPA answers "which docs form a
    * DENSE community" — two near-clique template clusters linked by one
    * accidental bridge pair stay separate communities here while CC
    * merges them, which is the grain a canonical-pick or
    * cluster-sampling policy actually wants.
    *
    * Exactness: the update is pure integer argmax (count desc, label
    * asc) over integer labels, so a fixed-`iters` run is engine-exact
    * and a SQL oracle can replay every round (the pageRankNanos /
    * bradleyTerryQ6 discipline). Fixed iterations, NOT
    * run-to-convergence: synchronous LPA can 2-cycle on bipartite
    * structures, so a convergence loop may never exit — a bounded
    * round count is the standard fix and keeps the oracle finite.
    *
    * Scale shape: per round, ONE edge-sized exchange — the
    * neighbor-label join rides the edge table persisted pre-partitioned
    * by `dst` (the lookup key; only the node-sized label frame shuffles
    * to meet it), then the joined rows repartition ONCE by `src`:
    * HashPartitioning(src) satisfies the clustering of BOTH the
    * (src, lbl) count agg and the src argmax agg (the subset rule), so
    * neither agg plans its own exchange — without the explicit
    * repartition, each agg would shuffle the edge-sized count frame
    * separately (LabelPropSpec pins the round's exchange count).
    * Per-round localCheckpoint keeps plan depth constant (the
    * bradleyTerryQ6 lesson). Label state is one (node, lbl) row per
    * node — never edge-sized.
    *
    * Returns (node, community) with community = the final label. */
  def labelPropagation(edges: DataFrame, iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters out of range: $iters")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // input contract (same as pageRankNanos): DISTINCT undirected pairs
    // — a repeated pair would count as a multi-edge in the label vote
    val e = edges
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges
        .select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("dst"))
      .persist(lvl)
    var lbl = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint()
    var chks: List[DataFrame] = List(lbl)
    (1 to iters).foreach { _ =>
      val next = lpRound(e, lbl).localCheckpoint()
      chks = next :: chks
      lbl = next
    }
    val out = lbl.select(col("node"), col("lbl").as("community"))
      .localCheckpoint()
    chks.foreach(Caches.releaseResult)
    e.unpersist(false)
    out
  }

  /** One LPA round, un-checkpointed — package-visible so the spec can
    * gate its plan shape (one src exchange feeding both aggs). */
  private[graft] def lpRound(e: DataFrame, lbl: DataFrame): DataFrame =
    e.join(lbl.select(col("node").as("dst"), col("lbl")), Seq("dst"))
      .repartition(col("src"))
      .groupBy("src", "lbl").agg(count(lit(1)).as("c"))
      // argmax by (count desc, label asc) == max of (c, -lbl): labels
      // are node ids >= 0, so -lbl is exact and orders ties ascending
      .groupBy("src")
      .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
      .select(col("src").as("node"), (-col("m.nl")).as("lbl"))
}
