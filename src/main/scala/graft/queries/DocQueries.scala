package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Caches.Persisted
import graft.Tables._
import graft.functions.TextFunctions
import graft.operators.{CorpusStats, Dedup, Graph, KeywordTag, SimilaritySearch, Tokenizer, Winnow}

/** The LLM-data-pipeline operator set (dedup, text analysis, similarity
  * search) over the `documents`/`embeddings` tables, oracle-checked where
  * DuckDB can express the math.
  *
  * The corpus has no literal duplicates, so the dedup queries first inject
  * deterministic duplicates/near-duplicates (same expression in Spark and
  * the oracle SQL) — the operators are then exercised on known-positive
  * data instead of vacuously returning zero rows.
  */
object DocQueries {

  /** documents ∪ exact copies (doc_id+100000 for doc_id%10=0)
    *           ∪ near copies (doc_id+200000, ' graft extra tail' appended,
    *             for doc_id%7=0). */
  /** Public alias for diagnostics (graft.Explain). */
  def docsWithDupsPublic(s: SparkSession, d: String): DataFrame =
    docsWithDups(s, d)

  /** q_keyword_tags lexicon: nested patterns on purpose (able⊂table,
    * can⊂scan, win⊂window) — the oracle duplicates these literally in
    * its VALUES clause (kept independent, not generated; a drift fails
    * the gate loudly). */
  private val keywordLexicon: Seq[(String, String)] = Seq(
    "table" -> "schema", "able" -> "schema",
    "scan" -> "exec", "can" -> "exec",
    "window" -> "exec", "win" -> "exec",
    "stream" -> "exec", "he" -> "pronoun")

  /** documents scan with the split-starvation guard: every query below
    * runs per-row CPU work (regex token stacks, shingle/minhash kernels,
    * PNG codecs) that a sub-cores partition count would serialize. */
  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  private def docsPar(s: SparkSession, d: String): DataFrame =
    graft.Tables.ensureParallelism(documents(s, d))

  /** (hyp, ref) evaluation pairs for the generation-eval queries —
    * two deterministic strata over the first 200 docs: even ids score
    * the doc against ITSELF plus a generated tail (near-perfect
    * pairs), odd ids against the NEXT doc's text (low-overlap cross
    * pairs). [[evalPairsSql]] is the same derivation in DuckDB. */
  private def evalPairs(s: SparkSession, d: String): DataFrame = {
    val docs = docsPar(s, d).select("doc_id", "text")
      .where(col("text").isNotNull)
    val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
      col("text").as("nxt"))
    docs.where(col("doc_id") < 200).join(nxt, Seq("doc_id"))
      .select(col("doc_id"), col("text").as("hyp"),
        when(col("doc_id") % 2 === 0,
          concat(col("text"), lit(" generated tail")))
          .otherwise(col("nxt")).as("ref"))
  }

  private val evalPairsSql: String =
    """SELECT d1.doc_id, d1.text AS hyp,
      |  CASE WHEN d1.doc_id % 2 = 0 THEN d1.text || ' generated tail'
      |       ELSE d2.text END AS ref
      |FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
      |WHERE d1.text IS NOT NULL AND d2.text IS NOT NULL
      |  AND d1.doc_id < 200""".stripMargin

  private def docsWithDups(s: SparkSession, d: String): DataFrame = {
    // ONE scan pass with a per-row explode instead of a 3-branch union:
    // the union shape re-read the (already repartitioned) scan three
    // times AND left every downstream cache/self-join with 3 × cores
    // partitions — the minhash/simhash/CC pipelines inherited ~96-task
    // map stages over kilobyte partitions (r17 optimization; same rows,
    // same values, one subtree). The oracle twin (docsWithDupsCte)
    // stays the UNION ALL form — proving the exploded plan row-identical.
    docsPar(s, d).select(posexplode(array(
        struct(col("doc_id"), col("text"), col("source")),
        struct((col("doc_id") + 100000).as("doc_id"), col("text"),
          col("source")),
        struct((col("doc_id") + 200000).as("doc_id"),
          concat(col("text"), lit(" graft extra tail")).as("text"),
          col("source")))).as(Seq("_copy", "r")),
      col("doc_id").as("_src_id"))
      .where(col("_copy") === 0 ||
        (col("_copy") === 1 && col("_src_id") % 10 === 0) ||
        (col("_copy") === 2 && col("_src_id") % 7 === 0))
      .select(col("r.doc_id"), col("r.text"), col("r.source"))
  }

  /** Deterministic page structure over the word-soup corpus (which has
    * no newlines or punctuation of its own): 8-word lines; a terminal
    * '.' on lines where (seed+j)%3 != 0; ' javascript' injected where
    * (seed+j)%7 == 0; page-level 'lorem ipsum' / curly-brace lines
    * appended for seed%13 == 0 / seed%17 == 0. The SAME expression runs
    * in the oracle CTE ([[pageCte]]), so the C4 and line-dedup rules are
    * exercised on known-positive structure — the docsWithDups
    * convention, at line grain. */
  private def pageText(seed: Column, text: Column): Column = {
    val ws = split(text, " ")
    val nLines = ceil(size(ws) / lit(8.0)).cast("int")
    val lines = transform(sequence(lit(0), nLines - 1), j =>
      concat(
        array_join(slice(ws, j * 8 + 1, lit(8)), " "),
        when((seed + j) % 7 === 0, " javascript").otherwise(""),
        when((seed + j) % 3 =!= 0, ".").otherwise("")))
    concat(
      array_join(lines, "\n"),
      when(seed % 13 === 0, "\nlorem ipsum dolor sit amet.").otherwise(""),
      when(seed % 17 === 0, "\nconfig { x }.").otherwise(""))
  }

  /** DuckDB twin of [[pageText]]: emits `(doc_id, page)` from a source
    * relation exposing (doc_id, text); `seed` is a SQL expression over
    * doc_id. */
  private def pageCte(source: String, seed: String): String =
    s"""pages AS (
       |  SELECT doc_id,
       |    array_to_string(list_transform(
       |      range(0, CAST(ceil(len(ws) / 8.0) AS BIGINT)),
       |      j -> array_to_string(ws[j*8+1:j*8+8], ' ')
       |        || CASE WHEN ($seed + j) % 7 = 0 THEN ' javascript' ELSE '' END
       |        || CASE WHEN ($seed + j) % 3 <> 0 THEN '.' ELSE '' END),
       |      chr(10))
       |    || CASE WHEN ($seed) % 13 = 0
       |         THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
       |    || CASE WHEN ($seed) % 17 = 0
       |         THEN chr(10) || 'config { x }.' ELSE '' END AS page
       |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM $source)
       |)""".stripMargin

  /** Dirty web snippet prefixed to the q_web_clean fixture docs: a
    * tagged block with entities (incl. the `&amp;lt;` double-escape
    * order case), five mojibake forms, and a script block that must
    * vanish wholesale. The SAME literal rides into the generated
    * oracle SQL. */
  private val webDirtyPrefix: String =
    "<div class=\"post\">CafÃ© &amp; crÃ¨me â€” itâ€™s &lt;fine&gt; " +
      "&amp;lt;kept&amp;gt;</div><script>var x = 1 &lt; 2;</script> "

  private val docsWithDupsCte: String =
    """WITH docs AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text, source FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000, text || ' graft extra tail', source
      |  FROM documents WHERE doc_id % 7 = 0
      |)""".stripMargin

  /** All-pairs word-trigram Jaccard >= 0.5 pairs over `docs` — the
    * truth twin of the minhash pair generator (the q_minhash_pairs
    * pinned property), shared by the graph-oracle queries. Emits
    * `pairs`. */
  private val trigramPairsCte: String =
    """, toks AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
      |      ' ') AS t
      |  FROM docs
      |), g AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(range(1, len(t) - 1),
      |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
      |  FROM toks WHERE len(t) >= 3
      |), pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      |    (len(a.grams) + len(b.grams)
      |      - len(list_intersect(a.grams, b.grams))) >= 0.5
      |)""".stripMargin

  /** [[graft.operators.Graph.pageRankNanos]]'s integer recurrence,
    * unrolled: deg/nn/it0..it5 over the symmetric edge CTE `edges`
    * (src, dst). Every op is integer division/multiplication, so the
    * replay is exact on both engines. */
  private def pageRankCtes(edges: String): String =
    s""", deg AS (
       |  SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
       |  FROM $edges GROUP BY src
       |), nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg
       |), it0 AS (
       |  SELECT node, deg,
       |    CAST(1000000000 // (SELECT n_nodes FROM nn) AS BIGINT) AS pr
       |  FROM deg
       |)""".stripMargin +
    (1 to 5).map { k =>
      s""", it$k AS (
         |  SELECT d.node, d.deg,
         |    CAST(150000000 // (SELECT n_nodes FROM nn)
         |      + (17 * coalesce(m.s, 0)) // 20 AS BIGINT) AS pr
         |  FROM deg d LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(sum(p.pr // p.deg) AS BIGINT) AS s
         |    FROM $edges e JOIN it${k - 1} p ON e.src = p.node
         |    GROUP BY e.dst) m ON d.node = m.node
         |)""".stripMargin
    }.mkString

  /** Unrolled Bradley–Terry MM iterations (the pageRankCtes pattern):
    * expects CTEs `sym(src, dst, n)`, `items(item, wins, n_matches)`
    * and `nn(n_items)` upstream; emits it0..it`iters` where each
    * iteration replays the operator's integer arithmetic exactly —
    * per-edge floor-divided terms, clamped raw strengths, mean
    * normalization with the same greatest() guards. */
  private def btCtes(iters: Int): String =
    """, it0 AS MATERIALIZED (
      |  SELECT item, CAST(1000000 AS BIGINT) AS p FROM items
      |)""".stripMargin +
    (1 to iters).map { k =>
      s""", raw$k AS MATERIALIZED (
         |  SELECT i.item,
         |    least((i.wins * 1000000000) //
         |      greatest(coalesce(d.denom, 0), 1),
         |      1000000000000) AS praw
         |  FROM items i LEFT JOIN (
         |    SELECT s.src AS item,
         |      CAST(sum((s.n * 1000000000) // (pa.p + pb.p)) AS BIGINT)
         |        AS denom
         |    FROM sym s JOIN it${k - 1} pa ON s.src = pa.item
         |      JOIN it${k - 1} pb ON s.dst = pb.item
         |    GROUP BY s.src) d ON i.item = d.item
         |), it$k AS MATERIALIZED (
         |  SELECT item, CAST(greatest((praw * 1000000) //
         |    greatest((SELECT sum(praw) FROM raw$k) //
         |      (SELECT n_items FROM nn), 1), 1) AS BIGINT) AS p
         |  FROM raw$k
         |)""".stripMargin
    }.mkString

  /** [[graft.operators.Graph.labelPropagation]]'s deterministic sync
    * update, unrolled: lp0 = identity labels over the symmetric edge
    * CTE `e0`; each round every node takes the most frequent neighbor
    * label, ties to the smallest (min over the max-count labels —
    * exactly the operator's max(struct(c, -lbl)) argmax). */
  private def lpCtes(iters: Int): String =
    """, lp0 AS MATERIALIZED (
      |  SELECT DISTINCT src AS node, src AS lbl FROM e0
      |)""".stripMargin +
    (1 to iters).map { k =>
      s""", lp$k AS MATERIALIZED (
         |  SELECT src AS node, min(lbl) AS lbl FROM (
         |    SELECT e.src, l.lbl, count(*) AS c,
         |      max(count(*)) OVER (PARTITION BY e.src) AS mx
         |    FROM e0 e JOIN lp${k - 1} l ON e.dst = l.node
         |    GROUP BY e.src, l.lbl)
         |  WHERE c = mx GROUP BY src
         |)""".stripMargin
    }.mkString

  /** The shared KMeans replay prefix — quantize at 1024, md5-draw seed
    * pick, exact-integer distances, nearest assignment with ties to
    * the lowest cluster (emits `e`/`init`/`d`/`a`; assigned rows are
    * `a WHERE rn = 1`). ONE definition consumed by BOTH the
    * q_kmeans_iter and q_cluster_balance oracles, so a change to the
    * shared math cannot land on only one of them. */
  private def kmeansAssignBody(source: String, k: Int): String =
    s"""e AS (
      |  SELECT vec_id,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
      |  FROM $source
      |), init AS (
      |  SELECT q, CAST(row_number() OVER (
      |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS BIGINT)
      |    AS cluster_id
      |  FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $k
      |), d AS (
      |  SELECT e.vec_id, i.cluster_id, e.q,
      |    list_sum(list_transform(range(1, 65),
      |      j -> (e.q[j] - i.q[j]) * (e.q[j] - i.q[j]))) AS dist
      |  FROM e CROSS JOIN init i
      |), a AS (
      |  SELECT vec_id, cluster_id, q,
      |    row_number() OVER (PARTITION BY vec_id
      |      ORDER BY dist, cluster_id) AS rn
      |  FROM d
      |)""".stripMargin

  private val kmeansAssignCtes: String =
    "WITH " + kmeansAssignBody("embeddings", 8)

  /** All-pairs word-trigram Jaccard truth between the WHOLE indexed
    * corpus (build half + append half) and the derived crawl batch —
    * shared by q_dedup_index_probe (broadcast plan) and
    * q_dedup_index_backfill (keyed plan): one truth, two physical
    * dataflows against the same persisted index. */
  private val dedupIndexProbeOracle: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
      |), batch AS (
      |  SELECT doc_id + 300000 AS batch_id,
      |    text || ' crawl extra tail' AS text
      |  FROM documents WHERE text IS NOT NULL AND doc_id % 5 = 0
      |), cg AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
      |  FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
      |    '\s+', ' ', 'g'), ' ') AS t FROM corpus) WHERE len(t) >= 3
      |), bg AS (
      |  SELECT batch_id, list_distinct(list_transform(range(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
      |  FROM (SELECT batch_id, string_split(regexp_replace(lower(trim(text)),
      |    '\s+', ' ', 'g'), ' ') AS t FROM batch) WHERE len(t) >= 3
      |)
      |SELECT c.doc_id AS id, b.batch_id,
      |  floor(CAST(len(list_intersect(c.grams, b.grams)) AS DOUBLE) /
      |    (len(c.grams) + len(b.grams) - len(list_intersect(c.grams, b.grams)))
      |    * 1e6) / 1e6 AS jaccard
      |FROM cg c JOIN bg b ON true
      |WHERE CAST(len(list_intersect(c.grams, b.grams)) AS DOUBLE) /
      |  (len(c.grams) + len(b.grams) - len(list_intersect(c.grams, b.grams)))
      |  >= 0.5
      |ORDER BY 1, 2""".stripMargin

  /** SQL twin of [[graft.operators.SemDedup.verdicts]] on the injected
    * corpus: the shared k-means assignment body (over the UNIONED
    * source — same seeding math as q_kmeans_iter/q_cluster_balance),
    * cluster-scoped quantized-cosine pairs, the q_embed_dedup
    * recursive min-label closure, then the keep-the-outlier pick
    * (lowest centroid cosine, ties to min id) as a window rank. */
  private val semDedupOracle: String = semDedupOracleFor(8)

  /** The q_semdedup_planned twin: k comes from the SAME Scala planner
    * the Spark side calls — semdedupKFor over the gate-SF corpus
    * count (500 embeddings + 25 injected copies = 525) — so a planner
    * change re-generates the oracle with it. Valid at the gate SF
    * only (the Spark side recounts per-corpus); Verify omits this
    * oracle elsewhere, the q_ann_ivf pinning rule. */
  private val semDedupPlannedOracle: String = semDedupOracleFor(
    graft.operators.SemDedup.semdedupKFor(525L, targetCellRows = 64L))

  /** The 2-probe twin under the probeCells-aware planner (r14 verdict
    * #3): k is generated by the SAME Scala planner with probeCells=2
    * over the gate-SF corpus count, so both the planner arithmetic
    * and the multi-probe pair domain are pinned in one row. Gate-SF
    * only, the q_semdedup_planned rule. */
  private val semDedupProbe2PlannedOracle: String = semDedupOracleFor(
    graft.operators.SemDedup.semdedupKFor(525L, targetCellRows = 64L,
      probeCells = 2),
    probeCells = 2)

  private def semDedupOracleFor(k: Int, probeCells: Int = 1): String = {
    val src =
      """(SELECT vec_id, embedding FROM embeddings
        |    UNION ALL
        |    SELECT vec_id + 100000 AS vec_id, embedding
        |    FROM embeddings WHERE vec_id % 20 = 0)""".stripMargin
    // single-cell pairs: the r13 oracle verbatim. Multi-probe: the
    // pair domain is the rn <= probeCells assignment, and a pair
    // sharing several probed cells counts once — at the smallest
    // shared cell (the Spark side's row-local array_intersect dedup,
    // replayed over per-vec cell lists)
    val pairsCte =
      if (probeCells == 1)
        """pairs AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
          |      CAST(floor(list_cosine_similarity(x.v, y.v) * 1e6)
          |        AS BIGINT) AS cq
          |    FROM asg x JOIN asg y
          |      ON x.cluster = y.cluster AND x.vec_id < y.vec_id)
          |  WHERE cq >= 990000
          |)""".stripMargin
      else
        s"""probed AS (
          |  SELECT a.vec_id, a.cluster_id AS cluster, ev.v
          |  FROM a JOIN ev USING (vec_id) WHERE a.rn <= $probeCells
          |), cellsets AS (
          |  SELECT vec_id, list_sort(list(cluster)) AS cells
          |  FROM probed GROUP BY vec_id
          |), pairs AS (
          |  SELECT id_a, id_b FROM (
          |    SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cluster,
          |      cx.cells AS ca, cy.cells AS cb,
          |      CAST(floor(list_cosine_similarity(x.v, y.v) * 1e6)
          |        AS BIGINT) AS cq
          |    FROM probed x JOIN probed y
          |      ON x.cluster = y.cluster AND x.vec_id < y.vec_id
          |    JOIN cellsets cx ON cx.vec_id = x.vec_id
          |    JOIN cellsets cy ON cy.vec_id = y.vec_id)
          |  WHERE cq >= 990000
          |    AND cluster = list_min(list_intersect(ca, cb))
          |)""".stripMargin
    "WITH RECURSIVE " + kmeansAssignBody(src, k) +
      s""", ev AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM $src e2
        |), asg AS (
        |  SELECT a.vec_id, a.cluster_id AS cluster, ev.v
        |  FROM a JOIN ev USING (vec_id) WHERE a.rn = 1
        |), $pairsCte, sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs
        |), reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM asg
        |  UNION
        |  SELECT s.dst, r.label FROM reach r JOIN sym s ON r.id = s.src
        |), comp AS (
        |  SELECT id, min(label) AS component FROM reach GROUP BY id
        |), cent AS (
        |  SELECT asg.vec_id, asg.cluster, comp.component,
        |    CAST(floor(list_cosine_similarity(asg.v,
        |      list_transform(i.q, x -> x / 1024.0)) * 1e6) AS BIGINT)
        |      AS centroid_cos_q
        |  FROM asg
        |  JOIN init i ON i.cluster_id = asg.cluster
        |  JOIN comp ON comp.id = asg.vec_id
        |)
        |SELECT vec_id, CAST(cluster AS INT) AS cluster, component,
        |  centroid_cos_q,
        |  row_number() OVER (PARTITION BY component
        |    ORDER BY centroid_cos_q, vec_id) = 1 AS keep
        |FROM cent ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- text analysis: token counting + quality signals ----
    "q_doc_stats" -> ((s, d) => {
      docsPar(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        TextFunctions.tokenCountWs(col("text")).as("n_tokens_ws"),
        TextFunctions.tokenCountBpeish(col("text")).as("n_tokens_bpeish"),
        size(filter(split(lower(trim(col("text"))), "\\s+"),
          t => t.isInCollection(TextFunctions.enStopwords)))
          .cast("long").as("stop_hits"),
        round(TextFunctions.punctRatio(col("text")), 6).as("punct_ratio"))
        .orderBy("doc_id")
    }),

    // ---- BM25 relevance ranking (Okapi k1=1.2 b=0.75) of a fixed query
    // against the corpus: TF via keyed shuffle, DF/IDF broadcast back,
    // corpus scalars in-plan, distributed top-k — engine-deterministic
    // via per-term contribution quantization (integer sums commute;
    // float sums don't) ----
    "q_bm25" -> ((s, d) => {
      import graft.operators.Relevance
      val ranked = Relevance.bm25(docsPar(s, d), "doc_id", "text",
          Seq("vector", "stream", "window"), quantize = Some(1000000L))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
      // rank stamped on the 20-row result (tiny single partition), not on
      // the corpus — the top-k itself is TakeOrderedAndProject. The window
      // partitions on a constant bucket derived from a real column
      // (substring(doc_id, 1, 0) = "" for every row): a foldable literal
      // would be stripped by EliminateWindowPartitions and re-trip
      // WindowExec's "No Partition Defined" warning, which on a full-size
      // frame flags a genuine scale bug — keep it meaningful.
      import org.apache.spark.sql.expressions.Window
      // coalesce: substring of a NULL doc_id is NULL (not ""), which would
      // split the window into two partitions and duplicate ranks
      ranked.withColumn("rank",
          row_number().over(
            Window.partitionBy(coalesce(
                substring(col("doc_id").cast("string"), 1, 0), lit("")))
              .orderBy(col("score").desc, col("doc_id"))))
        .select("rank", "doc_id", "n_terms_hit", "score")
        .orderBy("rank")
    }),

    // ---- deterministic source-mixture sampling (dataset mixing):
    // md5-draw keep/drop per source weight; the oracle recomputes each
    // draw exactly via md5_number_upper, so membership is row-for-row ----
    "q_mixture" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.mixtureSample(docsPar(s, d).select("doc_id", "source"),
          "doc_id", "source",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25,
            "src3" -> 0.1, "src4" -> 0.75))
        .orderBy("doc_id")
    }),

    // ---- exact dedup via fingerprint groupBy ----
    "q_dedup_exact" -> ((s, d) => {
      Dedup.exactDupGroups(docsWithDups(s, d), "doc_id", "text")
        .select(col("canonical_id"), col("n_dups"))
        .orderBy("canonical_id")
    }),

    // ---- n-gram Jaccard near-dup pairs (blocked by source).
    // VERIFICATION-ONLY: the self-join is all-pairs within each source
    // block — O(n²/blocks) — and exists as the exact-Jaccard truth twin
    // for the minhash/simhash operators, which are the production near-dup
    // paths at scale. Never run this shape on a full-size corpus; use
    // Dedup.minhashDupPairs / simhashDupPairs instead. ----
    "q_jaccard_pairs" -> ((s, d) => {
      val g = docsWithDups(s, d).select(
        col("doc_id"), col("source"),
        TextFunctions.shingles(col("text"), 5).as("grams"))
      val a = g.select(col("doc_id").as("id_a"), col("source"),
        col("grams").as("g_a"))
      val b = g.select(col("doc_id").as("id_b"), col("source"),
        col("grams").as("g_b"))
      a.join(b, Seq("source"))
        .where(col("id_a") < col("id_b"))
        .withColumn("jaccard", Dedup.jaccard(col("g_a"), col("g_b")))
        .where(col("jaccard") >= 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- MinHash-LSH near-dup pairs, oracle-checked against the ALL-PAIRS
    // word-trigram Jaccard truth: the signature internals are
    // hash-library-specific, but the OUTPUT contract (every pair above
    // threshold, with its exact verified jaccard) is engine-independent.
    // Banding recall is exact on the fixed verify corpus (measured: the
    // 171 truth pairs == the 171 banded candidates that verify); at other
    // scales recall < 1 is possible — measured 1685/1686 at sf0.1 (one
    // j=0.69 pair missed, P(miss)≈0.13 at 8 bands × 4 rows) — the
    // property is pinned to the gate's data, the probabilistic guarantee
    // is covered in KernelSpec. ----
    "q_minhash_pairs" -> ((s, d) => {
      Dedup.minhashDupPairs(docsWithDups(s, d), "doc_id", "text",
          threshold = 0.5)
        .select(col("id_a"), col("id_b"),
          (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
        .orderBy("id_a", "id_b")
    }),

    // ---- near-dup CLUSTERS: transitive closure over the minhash pairs →
    // canonical id per cluster (min id) — the production dedup capstone;
    // oracle recomputes components with a recursive CTE over the same
    // all-pairs trigram truth the pair gate is pinned to ----
    "q_dedup_clusters" -> ((s, d) => {
      val docs = docsWithDups(s, d)
      val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
        threshold = 0.5)
      val comp = Dedup.connectedComponents(docs.select("doc_id"), pairs,
        "doc_id")
      // comp is eagerly checkpointed with flat lineage: the pair
      // frame's checkpoint blocks are orphaned now — release them
      // deterministically (SoakSpec's session contract)
      graft.operators.Caches.releaseResult(pairs)
      comp
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"))
        .where(col("n_members") > 1)
        .select(col("component").as("canonical_id"), col("n_members"))
        .orderBy("canonical_id")
    }),

    // ---- per-document TF-IDF keyword extraction (the classic summary /
    // routing signal): top-3 terms per doc by tf · floor(ln(N/df)·1e6),
    // ties broken lexicographically. The integer-quantized IDF makes the
    // ranking engine-exact (ln of an identical ratio of exact integers —
    // the q_bm25 discipline); the per-doc top-3 runs as a
    // WindowGroupLimit (bounded per-task state), never a full sort. ----
    "q_tfidf_keywords" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val stats = graft.operators.Relevance.termStats(
        docsPar(s, d), "doc_id", "text")
      val nd = stats.select("doc_id").distinct().agg(count(lit(1)).as("n"))
      val scored = stats.crossJoin(broadcast(nd))
        .select(col("doc_id"), col("term"),
          (col("tf") * floor(log(col("n").cast("double") / col("df")) *
            1000000).cast("long")).as("score_q6"))
      scored
        .withColumn("rk", row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_q6").desc, col("term"))))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("term"), col("score_q6"))
        .orderBy("doc_id", "rk")
    }),

    // ---- embedding cluster cohesion / outlier score (mislabel and
    // noise detection in SemDeDup-style curation): per-label centroid,
    // per-vector Euclidean distance to its own label's centroid. All
    // arithmetic until the final sqrt is EXACT INTEGER: components
    // quantize to 1e-4 grain, and the per-dim deviation is computed as
    // xq·n − Σxq (the centroid scaled by n) so no division — and no
    // order-dependent float sum — ever happens inside an aggregate.
    // Bound: |x|·10⁴·n_label ≲ 3·10⁹ keeps diff² · dim inside Long —
    // holds to sf 1000 for unit-norm embeddings (|x| ≤ 1, dim 64). ----
    "q_embed_cohesion" -> ((s, d) => {
      val q = embeddings(s, d).select(col("vec_id"), col("label"),
          posexplode(transform(col("embedding"),
            x => round(x.cast("double") * 10000).cast("long"))))
        .withColumnRenamed("pos", "dim")
        .withColumnRenamed("col", "xq")
      val cent = q.groupBy("label", "dim")
        .agg(sum("xq").as("s"), count(lit(1)).as("n"))
      q.join(broadcast(cent), Seq("label", "dim"))
        .withColumn("diff", col("xq") * col("n") - col("s"))
        .groupBy("vec_id", "label")
        .agg(sum(col("diff") * col("diff")).as("dist2_scaled"),
          max("n").as("n"))
        .select(col("vec_id"), col("label"), col("dist2_scaled"),
          round(sqrt(col("dist2_scaled").cast("double")) /
            (col("n") * 10000), 6).as("dist"))
        .orderBy("vec_id")
    }),

    // ---- Johnson–Lindenstrauss ±1 random projection (Achlioptas
    // 2003): 64-dim embeddings → 16 dims through a deterministic
    // md5-derived sign matrix — the training-free scale path beside
    // PCA. Exact integer sums per component (quantize-then-sum); the
    // oracle replays every sign bit via md5_number_upper % 2. ----
    "q_jl_reduce" -> ((s, d) => {
      SimilaritySearch.jlReduce(
          embeddings(s, d).select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", k = 16)
        .orderBy("vec_id", "out_dim")
    }),

    // ---- PageRank centrality over the near-dup graph: the
    // "pick the authoritative copy" policy one rung above min(id)
    // canonicalization (and the CommonCrawl-style host-authority
    // primitive). Edges are the minhash near-dup pairs; the rank is
    // [[Graph.pageRankNanos]]'s integer nano-probability recurrence, so
    // the oracle can replay all five iterations exactly — it rebuilds
    // the edge set from the ALL-PAIRS trigram Jaccard truth (the
    // q_minhash_pairs pinned property: banded candidates == truth at
    // the gate) and unrolls the recurrence in SQL. ----
    "q_pagerank" -> ((s, d) => {
      // minhashDupPairs returns an eagerly-materialized (checkpointed)
      // pair frame, so pageRankNanos' symmetric edge union — which
      // reads it TWICE in its first job — scans the checkpoint instead
      // of racing the bands+verify pipeline once per direction (the
      // lazy-persist version measured ~2× pair-gen cost at sf0.1).
      val pairs = Dedup.minhashDupPairs(docsWithDups(s, d), "doc_id",
          "text", threshold = 0.5)
        .select("id_a", "id_b")
      val pr = Graph.pageRankNanos(pairs, iters = 5)
      // pr is eagerly checkpointed flat — free the orphaned pair
      // checkpoint now rather than at ContextCleaner GC time
      graft.operators.Caches.releaseResult(pairs)
      pr
        .select(col("node").as("doc_id"), col("deg"), col("pr_nanos"))
        .orderBy("doc_id")
    }),

    // ---- triangle counts + local clustering coefficient over the
    // near-dup graph: near-clique clusters (shared template,
    // clustering → 1) vs chained drift (low clustering) — the dedup-QA
    // signal that tells the two apart before choosing a canonical-pick
    // policy. Exact integers; the oracle rebuilds the edge set from
    // the all-pairs trigram truth and replays the same a<b<c wedge
    // closure ----
    "q_triangles" -> ((s, d) => {
      val pairs = Dedup.minhashDupPairs(docsWithDups(s, d), "doc_id",
          "text", threshold = 0.5)
        .select("id_a", "id_b")
      Graph.triangleStats(pairs)
        .select(col("node").as("doc_id"), col("deg"), col("n_tri"),
          col("clustering_ppm"))
        .orderBy("doc_id")
    }),

    // ---- label-propagation communities over the near-dup graph:
    // where CC answers "transitively linked at all", LPA answers
    // "densely linked" — two template clusters joined by one bridge
    // pair stay separate communities. Deterministic integer argmax,
    // fixed 4 rounds; the oracle replays every round off the trigram
    // truth edges ----
    "q_label_prop" -> ((s, d) => {
      val pairs = Dedup.minhashDupPairs(docsWithDups(s, d), "doc_id",
          "text", threshold = 0.5)
        .select("id_a", "id_b")
      val lp = Graph.labelPropagation(pairs, iters = 4)
      // lp is eagerly checkpointed flat — free the orphaned pair
      // checkpoint now (the q_pagerank discipline)
      graft.operators.Caches.releaseResult(pairs)
      lp.select(col("node").as("doc_id"), col("community"))
        .orderBy("doc_id")
    }),

    // ---- canonical-pick composition: connected components over the
    // near-dup pairs + PageRank centrality, canonical = the
    // highest-ranked member of each multi-doc cluster (ties → min id) —
    // the policy upgrade over q_dedup_clusters' min(id). The pair set
    // is checkpoint-materialized by minhashDupPairs: it feeds BOTH the
    // CC loop and the PR iterations, and recomputing it would mean
    // re-running the whole minhash bands+verify pipeline per consumer.
    // Per-cluster argmax runs as a WindowGroupLimit (bounded state). ----
    "q_dedup_canonical" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = docsWithDups(s, d)
      // minhashDupPairs is eagerly materialized (checkpointed), so the
      // expensive bands+verify pipeline runs exactly once even though
      // BOTH the CC loop and the PR iterations consume the pair frame;
      // CC and PR each checkpoint their own result, so nothing here
      // leaves storage-memory residue behind.
      val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
          threshold = 0.5)
        .select("id_a", "id_b")
      // CC and PR are INDEPENDENT consumers of the (already
      // materialized, flat-lineage) pair frame, and both are loops of
      // small driver-sequential jobs — run them from two threads so one
      // loop's scheduling gaps back-fill the other's (guide §2.6:
      // overlap independent jobs; FIFO scheduling gives exactly the
      // back-fill behavior). Deterministic: each loop's result is a
      // pure function of the pair set, unaffected by co-scheduling.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val compF = Future {
        Dedup.connectedComponents(docs.select("doc_id"), pairs, "doc_id")
      }
      val prF = Future { Graph.pageRankNanos(pairs, iters = 5) }
      val comp = Await.result(compF, Duration.Inf)
      val pr = Await.result(prF, Duration.Inf)
      // comp and pr are BOTH eagerly checkpointed with flat lineage, so
      // the pair frame's checkpoint blocks are no longer referenced by
      // anything downstream — release them NOW instead of waiting for
      // the ContextCleaner (SoakSpec caught exactly this residue)
      graft.operators.Caches.releaseResult(pairs)
      // every member of a >1 cluster has an edge, so the inner join
      // keeps exactly the multi-doc clusters' members
      comp.join(pr, comp("doc_id") === pr("node"))
        .select(col("component"), col("doc_id"), col("pr_nanos"))
        .withColumn("rk", row_number().over(Window.partitionBy("component")
          .orderBy(col("pr_nanos").desc, col("doc_id"))))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy("component")))
        .where(col("rk") === 1 && col("n_members") > 1)
        .select(col("component"), col("n_members"),
          col("doc_id").as("canonical_id"),
          col("pr_nanos").as("canonical_pr_nanos"))
        .orderBy("component")
    }),

    // ---- SimHash near-dup pairs, oracle-checked end to end: the portable
    // md5-derived shingle hash (bit-identical to DuckDB md5_number_upper)
    // lets the oracle recompute every 64-bit signature in SQL and take
    // ALL-PAIRS Hamming as truth — so the gate also proves the pigeonhole
    // blocking is complete (radius 7 → eight 8-bit chunks). ----
    "q_simhash_pairs" -> ((s, d) => {
      Dedup.simhashDupPairs(docsWithDups(s, d), "doc_id", "text",
          maxHamming = 7, portableHash = true)
        .orderBy("id_a", "id_b")
    }),

    // ---- embedding-cosine near-duplicate pairs: the SCALE path (LSH
    // bucket join + exact cosine verify, Dedup.embeddingDupPairs — a keyed
    // join, not a cross product), oracle-checked against the all-pairs
    // truth in DuckDB. Exact-copy vectors are injected (vec_id+100000 for
    // vec_id%20=0, same expression both sides) so the gate has positive
    // rows; identical vectors share any LSH bucket → recall 1 on them. ----
    "q_embed_dup_pairs" -> ((s, d) => {
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val withCopies = e.unionByName(
        e.where(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      Dedup.embeddingDupPairs(withCopies, "vec_id", "embedding",
          threshold = 0.99, bits = 16)
        // coarse round: candidate cosines sit at ~1.0, far from any
        // 0.00005 decimal boundary, so both engines round identically
        .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // ---- cross-split SEMANTIC leakage: hash-split the vectors, then
    // keep only near-dup pairs that STRADDLE splits — the
    // embedding-space decontamination check (q_decontaminate's n-grams
    // miss paraphrases; this catches them in embedding space). Copies
    // injected (vec_id+100000, the q_embed_dup_pairs convention) so
    // positives exist — a copy's id hashes independently of its
    // source's, so most dup pairs land in different splits. ----
    "q_split_leakage" -> ((s, d) => {
      import graft.operators.DataPrep
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val withCopies = e.unionByName(
        e.where(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val split = DataPrep.hashSplit(withCopies.select("vec_id"),
        "vec_id", Seq("train" -> "cc", "val" -> "e6"), rest = "test")
      Dedup.embeddingDupPairs(withCopies, "vec_id", "embedding",
          threshold = 0.99, bits = 16)
        .join(split.select(col("vec_id").as("id_a"),
          col("split").as("split_a")), Seq("id_a"))
        .join(split.select(col("vec_id").as("id_b"),
          col("split").as("split_b")), Seq("id_b"))
        .where(col("split_a") =!= col("split_b"))
        .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
          round(col("cosine"), 4).as("cosine"))
        .orderBy("id_a", "id_b")
    }),

    // ---- URL canonicalization (the CommonCrawl URL-dedup key): messy
    // variants injected deterministically — uppercase scheme/host, www.,
    // default vs explicit ports, unsorted params, utm_/gclid tracking
    // decorations, fragments — then canonicalized and grouped; the
    // group sizes PROVE the variants collapse (docs that differ only in
    // decoration share one canonical key) ----
    "q_url_canonical" -> ((s, d) => {
      val url = concat(
        lit("HTTPS://WWW.site"), (col("doc_id") % 7).cast("string"),
        lit(".example.com"),
        when(col("doc_id") % 3 === 0, lit(":443"))
          .when(col("doc_id") % 3 === 1, lit(":8080"))
          .otherwise(lit("")),
        lit("/p/"), (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 2 === 0,
          lit("?utm_source=feed&b=2&a=1&gclid=x"))
          .when(col("doc_id") % 10 === 7, lit(""))
          .otherwise(lit("?a=1&b=2")),
        // %10=7: NO query but a '?' inside the fragment — the case the
        // anchored query regex exists for (a bare \? would resurrect
        // 'x=1' as a query param; r11 advice)
        when(col("doc_id") % 5 === 0, lit("#frag"))
          .when(col("doc_id") % 10 === 7, lit("#sec?x=1"))
          .otherwise(lit("")))
      docsPar(s, d).select(col("doc_id"), url.as("url"))
        .select(TextFunctions.canonicalUrl(col("url")).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n"))
        .orderBy("canonical_url")
    }),

    // ---- URL extraction + registered-domain blocklist (the C4/RefinedWeb
    // domain-filter step): URLs injected deterministically (corpus has
    // none), extracted with the shared RE2∩Java pattern, reduced to the
    // last-two-label registered domain, flagged against a blocklist ----
    "q_url_filter" -> ((s, d) => {
      val injected = docsPar(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" see http://sub"), (col("doc_id") % 5).cast("string"),
              lit(".site"), (col("doc_id") % 7).cast("string"),
              lit(".example/p"), col("doc_id").cast("string")))
            .otherwise(lit("")),
          when(col("doc_id") % 9 === 0,
            concat(lit(" http://ads.example/x"), col("doc_id").cast("string")))
            .otherwise(lit(""))).as("text"))
      injected.select(col("doc_id"),
          size(TextFunctions.urls(col("text"))).cast("long").as("n_urls"),
          when(size(TextFunctions.urls(col("text"))) > 0,
            element_at(TextFunctions.domains(col("text")), 1))
            .otherwise(lit("")).as("first_domain"),
          TextFunctions.domainBlocked(col("text"), Seq("ads.example"))
            .as("blocked"))
        .orderBy("doc_id")
    }),

    // ---- SemDeDup-style semantic clustering (Abbas et al. 2023): the
    // LSH-bucketed cosine pairs above, closed into components — the step
    // that turns pair lists into one-keeper-per-semantic-cluster. The
    // oracle recomputes the clusters from the ALL-PAIRS cosine truth via
    // a recursive CTE, so agreement also re-proves bucketing recall. ----
    "q_embed_dedup" -> ((s, d) => {
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val withCopies = e.unionByName(
        e.where(col("vec_id") % 20 === 0)
          .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
      val pairs = Dedup.embeddingDupPairs(withCopies, "vec_id", "embedding",
        threshold = 0.99, bits = 16)
      Dedup.connectedComponents(withCopies.select("vec_id"), pairs, "vec_id")
        .groupBy(col("component").as("canonical_id"))
        .agg(count(lit(1)).as("n_members"))
        .where(col("n_members") > 1)
        .orderBy("canonical_id")
    }),

    // ---- language ID + quality scoring, oracle-checked: the DuckDB side
    // mirrors the stopword-table max and the clamped sub-score average
    // term by term. quality is compared floor-scaled (floor of an
    // identical double is engine-exact; round-to-decimal is not). The raw
    // xxhash64 fingerprint has no DuckDB twin, so the fingerprint is
    // compared through its collision structure (docs sharing a
    // fingerprint == docs sharing normalized text). ----
    "q_lang_quality" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      docsPar(s, d).select(
        col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang_detected"),
        (floor(TextFunctions.qualityScore(col("text")) * 1e6) / 1e6)
          .as("quality"),
        TextFunctions.fingerprint(col("text")).as("fingerprint"))
        .withColumn("n_same_fingerprint",
          count(lit(1)).over(Window.partitionBy("fingerprint")))
        .select("doc_id", "lang_detected", "quality", "n_same_fingerprint")
        .orderBy("doc_id")
    }),

    // ---- NFC normalization through the native codegen'd expression,
    // cross-engine vs DuckDB's utf8proc nfc_normalize (a JDK-vs-ICU
    // implementation parity gate). The ASCII corpus is invariant under
    // NFC, so each row is decorated with deterministic DEnormalized
    // prefixes (combining accents, the Angstrom singleton, a ligature
    // NFC must preserve) — the same composition in the oracle — making
    // the gate non-vacuous: post_len < pre_len on every row. ----
    "q_nfc_normalize" -> ((s, d) => {
      graft.plans.GraftExtensions.register(s)
      // \u escapes, not raw glyphs (an NFC-normalizing editor would
      // silently recompose them and vacuate the gate): combining acute,
      // Angstrom-sign singleton, combining diaeresis, fi ligature
      val deco = concat(
        lit("Cafe\u0301 \u212B nai\u0308ve \uFB01ne "),
        substring(col("text"), 1, 40))
      docsPar(s, d).select(col("doc_id"), deco.as("deco"))
        .select(
          col("doc_id"),
          TextFunctions.unicodeNormalize(col("deco"), "NFC").as("nfc_text"),
          length(col("deco")).cast("long").as("pre_len"),
          length(TextFunctions.unicodeNormalize(col("deco"), "NFC"))
            .cast("long").as("post_len"))
        .orderBy("doc_id")
    }),

    // ---- multimodal: REAL PNG encode → javax.imageio decode → pixel
    // features, oracle-checked against the closed-form fixture spec (the
    // synthetic media are solid-color PNGs whose dimensions and RGB are
    // pure functions of the id — Multimodal.syntheticSpec — so the decoded
    // channel means have exact integer expected values) ----
    "q_multimodal_features" -> ((s, d) => {
      import graft.multimodal.Multimodal
      val media = Multimodal.syntheticMedia(
        docsPar(s, d).select(col("doc_id")), "doc_id")
      Multimodal.extractFeatures(media)
        .select(col("media_id"), col("decode_ok"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          // channel means of a solid image are exactly rgb/255; scale back
          // and snap to the integer — engine-exact compare
          floor(element_at(col("embedding"), 1) * 255 + 0.5).as("r"),
          floor(element_at(col("embedding"), 2) * 255 + 0.5).as("g"),
          floor(element_at(col("embedding"), 3) * 255 + 0.5).as("b"))
        .orderBy("media_id")
    }),

    // ---- shard packing by token budget (training-data prep): exact
    // integer running sum per source, floor-division shard id ----
    "q_pack_shards" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.shardByTokenBudget(
          docsPar(s, d).select("doc_id", "source", "text"),
          "doc_id", "source",
          TextFunctions.tokenCountWs(col("text")), budget = 2048L)
        .select("doc_id", "source", "tokens", "shard_id")
        .orderBy("doc_id")
    }),

    // ---- packed training sequences: shard docs by token budget, then
    // concatenate each shard in id order — compared BYTE-LEVEL via md5 of
    // the packed text (equal strings ⇔ equal digests, both engines) ----
    "q_pack_sequences" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.packSequences(
          docsPar(s, d).select("doc_id", "source", "text"),
          "doc_id", "source",
          TextFunctions.tokenCountWs(col("text")), budget = 2048L)
        .select(col("source"), col("shard_id"), col("n_docs"),
          col("total_tokens"), md5(col("packed")).as("packed_md5"))
        .orderBy("source", "shard_id")
    }),

    // ---- deterministic content-hash train/val/test split (counts per
    // source × split; sha256 parity with the oracle is pinned by
    // q_hash_id) ----
    "q_hash_split" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.hashSplit(docsPar(s, d).select("doc_id", "source"),
          "doc_id", Seq("train" -> "cc", "val" -> "e6"), rest = "test")
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "split")
    }),

    // ---- Efraimidis–Spirakis weighted sampling without replacement:
    // per-source top-20 by u^(1/w) with w = n_chars — sample long docs
    // preferentially, deterministically (the weighted upgrade of
    // q_stratified_sample). Ranked by ln(u)/w: same order, no pow() in
    // the plan; the oracle replays the exact md5 uniform and key. ----
    "q_weighted_sample" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.weightedSample(
          docsPar(s, d).select(col("doc_id"), col("source"),
            col("n_chars")),
          "doc_id", "source", col("n_chars"), n = 20)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")
    }),

    // ---- the curation funnel: the full pretraining filter stack (lang →
    // quality → repetition → PII) composed into one per-source accounting
    // query, first-failing-rule attribution — every component is
    // individually oracle-proven above; this pins their composition ----
    "q_curation_funnel" -> ((s, d) => {
      val docs = docsPar(s, d).select(col("doc_id"), col("source"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" "),
          col("text")))                                   // repetition
          .when(col("doc_id") % 13 === 0, concat(col("text"),
            lit(" mail me: x"), col("doc_id"), lit("@spam.net")))  // PII
          .otherwise(col("text")).as("text"))
      val raw = TextFunctions.qualityScore(col("text"))
      val rep = TextFunctions.repetitionRatio(col("text"), 3)
      val (em, ip, ph) = TextFunctions.piiCounts(col("text"))
      val verdict =
        when(TextFunctions.langId(col("text")) === "und", "drop_lang")
          .when(raw < 0.4, "drop_quality")
          .when(rep > 0.2, "drop_repetition")
          .when(em + ip + ph > 0, "drop_pii")
          .otherwise("keep")
      docs.withColumn("verdict", verdict)
        .groupBy("source", "verdict")
        .agg(count(lit(1)).as("n"))
        .orderBy("source", "verdict")
    }),

    // ---- PII scrubbing (emails/IPs/phones): deterministic PII appended
    // in-query (same expression both sides), counted and redacted with
    // typed placeholders; the regexes stay in the RE2 ∩ Java dialect ----
    "q_pii" -> ((s, d) => {
      val docs = docsPar(s, d).select(col("doc_id"),
        when(col("doc_id") % 7 === 0, concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com or "),
          lit("10.0."), (col("doc_id") % 256).cast("string"), lit(".1 "),
          lit("555-867-"), lpad((col("doc_id") % 10000).cast("string"),
            4, "0")))
          .otherwise(col("text")).as("text"))
      val (e, i, p) = TextFunctions.piiCounts(col("text"))
      docs.select(col("doc_id"), e.as("n_emails"), i.as("n_ips"),
          p.as("n_phones"),
          length(TextFunctions.redactPii(col("text"))).cast("long")
            .as("redacted_len"))
        .orderBy("doc_id")
    }),

    // ---- intra-document repetition (Gopher/C4 duplicate-n-gram filter):
    // docs doubled in place (doc_id%5=0, same expression both sides) must
    // score ~0.5+, originals near 0 — exact integer-count math ----
    "q_repetition" -> ((s, d) => {
      val docs = docsPar(s, d).select(col("doc_id"),
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" "),
          col("text"))).otherwise(col("text")).as("text"))
      val raw = TextFunctions.repetitionRatio(col("text"), 3)
      // flag compares the RAW exact ratio (identical doubles both
      // engines); the emitted ratio is floor-scaled for display
      docs.select(col("doc_id"),
          (floor(raw * 1e6) / 1e6).as("rep_ratio"),
          (raw > 0.2).as("flagged"))
        .orderBy("doc_id")
    }),

    // ---- Gopher repetition-filter suite (Rae et al. 2021 Table A1):
    // duplicate-line fractions + top/dup n-gram char fractions, one
    // row-local kernel pass (no shuffle). Lines are synthesized
    // deterministically (replace ' the ' with newline — plain
    // non-overlapping string replace, identical both engines) since the
    // synthetic corpus is single-line; emitted ratios floor-scaled, the
    // q_repetition convention ----
    "q_gopher_repetition" -> ((s, d) => {
      val lined = docsPar(s, d).select(col("doc_id"),
        replace(col("text"), lit(" the "), lit("\n")).as("text"))
      def q6(c: org.apache.spark.sql.Column) = floor(c * 1e6) / 1e6
      lined
        .select(col("doc_id"),
          TextFunctions.gopherStats(col("text"), topN = 2, dupN = 5)
            .as("g"))
        .select(col("doc_id"),
          q6(col("g._1")).as("dup_line_frac"),
          q6(col("g._2")).as("dup_line_char_frac"),
          q6(col("g._3")).as("top_2gram_char_frac"),
          q6(col("g._4")).as("dup_5gram_char_frac"))
        .orderBy("doc_id")
    }),

    // ---- context-window chunking (training-data prep): split each doc
    // into 64-token chunks; emit per-chunk token count + first token —
    // the slice plumbing a tokenize-and-pack pipeline needs ----
    "q_chunk_docs" -> ((s, d) => {
      val t = docsPar(s, d).select(
        col("doc_id"),
        split(trim(col("text")), "\\s+").as("toks"),
        TextFunctions.tokenCountWs(col("text")).as("n_tokens"))
      // the per-chunk struct array is built INSIDE the row and `toks` is
      // dropped BEFORE the explode — exploding chunk_idx first would make
      // every chunk row carry the whole document's token array
      // (O(doc_len × n_chunks) bytes per doc) just to read one element
      t.where(col("n_tokens") > 0)
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0L), ceil(col("n_tokens") / 64.0).cast("long") - 1),
            i => struct(
              i.as("chunk_idx"),
              least(lit(64L), col("n_tokens") - i * 64).as("chunk_tokens"),
              element_at(col("toks"), (i * 64 + 1).cast("int"))
                .as("first_token")))).as("c"))
        .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_tokens"),
          col("c.first_token"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- overlapping passage windows (RAG / long-context chunking):
    // 64-token windows at stride 32 — every token lands in ≤ 2 chunks,
    // chunk boundaries never split the stride grid. Same row-local
    // discipline as q_chunk_docs: the per-chunk struct array is built
    // INSIDE the row and `toks` dropped before the explode. ----
    "q_chunk_stride" -> ((s, d) => {
      val win = 64L
      val stride = 32L
      val t = docsPar(s, d).select(
        col("doc_id"),
        split(trim(col("text")), "\\s+").as("toks"),
        TextFunctions.tokenCountWs(col("text")).as("n_tokens"))
      t.where(col("n_tokens") > 0)
        .select(col("doc_id"),
          explode(transform(
            sequence(lit(0L),
              ceil(greatest(col("n_tokens") - win, lit(0L)) /
                lit(stride.toDouble)).cast("long")),
            i => struct(
              i.as("chunk_idx"),
              (i * stride).as("start_tok"),
              least(lit(win), col("n_tokens") - i * stride)
                .as("chunk_tokens"),
              element_at(col("toks"), (i * stride + 1).cast("int"))
                .as("first_token")))).as("c"))
        .select(col("doc_id"), col("c.chunk_idx"), col("c.start_tok"),
          col("c.chunk_tokens"), col("c.first_token"))
        .orderBy("doc_id", "chunk_idx")
    }),

    // ---- per-document token-distribution Shannon entropy (a quality /
    // repetitiveness signal: low entropy = few distinct tokens dominate).
    // H = ln m − (Σ c·ln c)/m over the doc's unigram counts; the
    // Σ c·ln c term is floor-quantized per DISTINCT token (ln of an
    // identical integer-valued double, floored — the unigramLogProb
    // discipline) so the per-doc sum is an exact integer on any engine.
    // Words leave the row as xxhash64 keys (counts only need identity);
    // the oracle counts by word TEXT, so the gate proves the hashed
    // grouping lossless. ----
    "q_token_entropy" -> ((s, d) => {
      val words = docsPar(s, d).select(col("doc_id"),
          explode(filter(split(lower(trim(col("text"))), "\\s+"),
            t => length(t) > 0)).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("_wk"))
      words.groupBy("doc_id", "_wk").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tokens"),
          count(lit(1)).as("n_distinct"),
          sum(col("c") *
            floor(log(col("c").cast("double")) * 1000000).cast("long"))
            .as("sum_clnc_q6"))
        .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
          col("sum_clnc_q6"),
          round(log(col("n_tokens").cast("double")) -
            col("sum_clnc_q6").cast("double") /
              (col("n_tokens") * 1000000), 6).as("entropy"))
        .orderBy("doc_id")
    }),

    // ---- tokenizer-vocabulary coverage: per-document OOV rate against
    // the top-100 corpus words (frequency desc, ties lexicographic) —
    // the coverage curve every vocab-size decision reads. The corpus
    // reduces to a vocab-sized count table; top-100 is a TakeOrdered
    // (never a full sort) and broadcasts back. ----
    "q_vocab_coverage" -> ((s, d) => {
      val words = docsPar(s, d).select(col("doc_id"),
        explode(filter(split(lower(trim(col("text"))), "\\s+"),
          t => length(t) > 0)).as("w"))
      val top = words.groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(100)
      words
        .join(broadcast(top.select(col("w"), lit(1).as("_in"))),
          Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("_in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_rate",
          round(col("n_oov") / col("n_tokens"), 6))
        .orderBy("doc_id")
    }),

    // ---- exact duplicated-span detection (the substring-dedup signal of
    // Lee et al., "Deduplicating Training Data Makes Language Models
    // Better"): every word 8-gram appearing in >= 2 distinct docs,
    // reported as a per-doc duplicated-span count. Scale path: grams
    // leave the scan as 8-byte xxhash64 keys — the shuffle carries
    // (doc_id, hash) pairs, never the gram text. The oracle groups by
    // the gram text itself, so the check also proves the hashed plan
    // loses nothing (identical up to xxhash64 collisions, ~n²/2⁶⁴). ----
    "q_ngram_span_dedup" -> ((s, d) => {
      val n = 8
      val t = docsWithDups(s, d).select(
        col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
          .as("tk"))
      // per-doc DISTINCT grams, hashed before the explode so only the
      // 8-byte key ever leaves the row. The gram table feeds two plan
      // branches (shared-gram agg + per-doc join back); persist the
      // compact (doc_id, hash) pairs — 16 bytes/gram — so the text is
      // tokenized once, matching the minhash shingle-base discipline.
      // (At warehouse scale this would be a materialized intermediate.
      // Registered with Caches — Bench sweeps the registry per query;
      // in Verify the ~1 MB residue at the gate SF is harmless.)
      val grams = t.where(size(col("tk")) >= n)
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(0), size(col("tk")) - n),
          i => xxhash64(concat_ws(" ", slice(col("tk"), i + 1, lit(n))))
        ))).as("gh"))
        .persistTracked
      // grams are per-doc distinct, so count(*) per hash == distinct docs
      val shared = grams.groupBy("gh")
        .agg(count(lit(1)).as("n_docs"))
        .where(col("n_docs") >= 2)
      grams.join(shared.select("gh"), Seq("gh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup_grams"))
        .orderBy("doc_id")
    }),

    // ---- asymmetric gram containment C(a→b) = |g(a)∩g(b)| / |g(a)|:
    // the subset-duplication signal symmetric Jaccard misses when
    // |B| ≫ |A| (a short doc quoted wholesale inside a long one scores
    // C≈1 but Jaccard≈|A|/|B|). Pairs form through the gram-keyed join
    // (docs sharing ≥ minShared grams) — never all-pairs; only 8-byte
    // hashes shuffle. Grams with document frequency > maxDf are
    // excluded from PAIR FORMATION (a boilerplate gram in 10⁶ docs
    // would mint 10¹² pairs; df-capped grams carry no containment
    // signal worth that cost — the standard stop-shingle cap) but
    // still count in |g(a)|, so containment stays a true fraction of
    // the doc. ----
    "q_containment" -> ((s, d) => {
      val n = 8
      val minShared = 8L
      val maxDf = 100L
      val t = docsWithDups(s, d).select(
        col("doc_id"),
        split(regexp_replace(lower(trim(col("text"))), "\\s+", " "), " ")
          .as("tk"))
      val grams = t.where(size(col("tk")) >= n)
        .select(col("doc_id"), explode(array_distinct(transform(
          sequence(lit(0), size(col("tk")) - n),
          i => xxhash64(concat_ws(" ", slice(col("tk"), i + 1, lit(n))))
        ))).as("gh"))
        .persistTracked
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("grams_a"))
      val joinable = grams.groupBy("gh").agg(count(lit(1)).as("df"))
        .where(col("df") >= 2 && col("df") <= maxDf)
      val capped = grams.join(joinable.select("gh"), Seq("gh"))
      capped.select(col("doc_id").as("id_a"), col("gh"))
        .join(capped.select(col("doc_id").as("id_b"), col("gh")),
          Seq("gh"))
        .where(col("id_a") =!= col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
        .where(col("shared") >= minShared)
        .join(sizes.withColumnRenamed("doc_id", "id_a"), Seq("id_a"))
        // bare division of exact integers — identical IEEE on both
        // engines, no round() (the q_jl_reduce boundary lesson)
        .select(col("id_a"), col("id_b"), col("shared"), col("grams_a"),
          (col("shared").cast("double") / col("grams_a")).as("containment"))
        .orderBy("id_a", "id_b")
    }),

    // ---- maximal duplicated-substring spans (Lee et al. ExactSubstr,
    // the suffix-array half): per-position 8-token gram hashes →
    // >= 2-occurrence grams → gaps-and-islands merge into maximal spans
    // with exact token boundaries. The oracle replays positions over
    // the gram TEXT itself (proving the hashed plan loses nothing) and
    // the same window islands, so span boundaries must match exactly ----
    "q_exact_substr" -> ((s, d) => {
      Dedup.exactSubstrSpans(docsWithDups(s, d), "doc_id", "text",
          minLen = 8)
        .orderBy("doc_id", "span_start")
    }),

    // ---- keep-one ExactSubstr (Lee et al.'s published policy): each
    // duplicate chain's least-(doc_id, pos) occurrence is canonical and
    // survives; only the REST are reported as duplicated spans. The
    // per-chain argmin rides the chain-count agg (min(struct) in the
    // same shuffle); the oracle replays the argmin as a row_number over
    // the gram TEXT, so chain identity AND the keep-one filter are both
    // proven lossless under hashing ----
    "q_exact_substr_keep" -> ((s, d) => {
      Dedup.exactSubstrSpans(docsWithDups(s, d), "doc_id", "text",
          minLen = 8, keepOne = true)
        .orderBy("doc_id", "span_start")
    }),

    // ---- int8 symmetric embedding quantization (ANN index prep):
    // per-vector scale = max |x|, q_i = floor(x_i·127/scale), clamped to
    // -127 (IEEE can put x/maxabs a ulp below -1 when x = -maxabs, which
    // would floor to -128 and break the symmetric int8 range). Row-local
    // (no shuffle, codegen'd HOFs); float→double widening is exact, the
    // emitted scale is the EXACT divisor used (maxabs is a widened float,
    // so it round-trips bit-identically through both engines), and floor
    // of identical IEEE doubles is engine-exact. The vector is serialized
    // to a comma-joined string so the driver harness can hash it. ----
    "q_embed_quantize" -> ((s, d) => {
      val e = embeddings(s, d).select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("maxabs", array_max(transform(col("v"), x => abs(x))))
      e.select(col("vec_id"),
          col("maxabs").as("scale"),
          array_join(
            when(col("maxabs") === 0d, transform(col("v"), _ => lit(0)))
              .otherwise(transform(col("v"),
                x => greatest(lit(-127d), floor(x * 127.0 / col("maxabs")))
                  .cast("int")))
              .cast("array<string>"), ",").as("q8"))
        .orderBy("vec_id")
    }),

    // ---- benchmark decontamination: corpus docs sharing >= 2 distinct
    // word trigrams with the (deterministic) benchmark subset ----
    "q_decontaminate" -> ((s, d) => {
      import graft.operators.DataPrep
      val docs = docsPar(s, d).select("doc_id", "text")
      val benchmark = docs.where(col("doc_id") % 97 === 0)
      DataPrep.contaminationFlags(
          docs.where(col("doc_id") % 97 =!= 0), benchmark,
          "doc_id", "text", n = 3, minOverlap = 2)
        .orderBy("doc_id")
    }),

    // ---- web-text cleanup (scraped-corpus ingestion): HTML strip +
    // pinned entity unescape + UTF-8-as-cp1252 mojibake repair +
    // whitespace collapse, all codegen'd builtins, zero shuffle. The
    // fixture prefixes every 9th doc with a dirty snippet covering
    // script-block removal, tag→space, entity order (&amp; last), and
    // five mojibake forms; the oracle SQL is GENERATED from the same
    // replacement tables (TextFunctions.webCleanSql) so it cannot
    // drift ----
    "q_web_clean" -> ((s, d) => {
      docsPar(s, d).where(col("doc_id") % 9 === 0)
        .select(col("doc_id"),
          TextFunctions.webClean(
            concat(lit(webDirtyPrefix), col("text"))).as("clean"))
        .orderBy("doc_id")
    }),

    // ---- content-defined chunking (Rabin-style rolling-hash
    // boundaries) + chunk-grain dedup rollup: per doc, chunk count,
    // chunk-length sum (structurally = doc length — the oracle enforces
    // it) and how many chunks are shared with another doc. Runs on
    // docsWithDups so the exact/near copies produce known-positive
    // shared chunks; the oracle replays the polynomial boundary hash
    // from the SAME premultiplied power table (Cdc.powerTable) ----
    "q_cdc_chunks" -> ((s, d) => {
      graft.operators.Cdc.chunkStats(docsWithDups(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- trained language ID: Cavnar–Trenkle character-trigram rank
    // profiles from the doc_id%5=0 labeled split, out-of-place distance
    // scoring against broadcast profiles — the classifier rung above
    // q_lang_quality's stopword heuristic. Integer distances with a
    // total-order rank (count DESC, trigram ASC), so the oracle replays
    // the whole classifier exactly ----
    "q_lid_rank" -> ((s, d) => {
      graft.operators.LangId.rankProfileLid(docsPar(s, d), "doc_id",
          "text", "lang", col("doc_id") % 5 === 0, topN = 20)
        .orderBy("doc_id")
    }),

    // ---- WordPiece tokenization (the BERT tokenizer; third member of
    // the tokenizer trio beside BPE and Unigram-LM): greedy longest-
    // match-first against a frequency-ranked vocab of word-initial +
    // ##-continuation pieces, BERT's whole-word [UNK] rules. The greedy
    // kernel runs per DISTINCT word (the BPE-encode pattern); the
    // oracle replays training rank-for-rank and the greedy march as an
    // unrolled CTE chain ----
    "q_wordpiece" -> ((s, d) => {
      graft.operators.WordPiece.encodeStats(docsPar(s, d), "doc_id",
          "text")
        .orderBy("doc_id")
    }),

    // ---- n-gram novelty (incremental-crawl curation): fraction of a
    // doc's distinct word trigrams first seen in THIS doc, doc_id as
    // ingestion order — runs on docsWithDups so the exact/near copies
    // are known ~zero-novelty positives. Grams shuffle as portable
    // md5 56-bit hashes; exact integer ppm ratio ----
    "q_gram_novelty" -> ((s, d) => {
      Dedup.gramNovelty(docsWithDups(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- benchmark decontamination at NEAR-DUP grain: minhash-banded
    // bipartite candidates (corpus bands × broadcast benchmark bands),
    // exact-Jaccard verified — catches paraphrased benchmark copies the
    // gram-overlap check above misses as whole-document similarity.
    // Fixture: benchmark = doc_id % 50 = 0; train = the rest ∪ perturbed
    // benchmark copies (+300000, ' graft extra tail'), so known
    // positives exist. Oracle = bipartite ALL-PAIRS word-trigram Jaccard
    // truth (the q_minhash_pairs pinned-recall convention). ----
    "q_decontaminate_neardup" -> ((s, d) => {
      val docs = docsPar(s, d).select("doc_id", "text")
      val bench = docs.where(col("doc_id") % 50 === 0)
      val train = docs.where(col("doc_id") % 50 =!= 0)
        .unionByName(bench.select((col("doc_id") + 300000).as("doc_id"),
          concat(col("text"), lit(" graft extra tail")).as("text")))
      Dedup.minhashCrossDupPairs(train, bench, "doc_id", "text",
          threshold = 0.5)
        .select(col("id").as("doc_id"), col("ref_id"),
          (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
        .orderBy("doc_id", "ref_id")
    }),

    // ---- persisted dedup index, full ingest cycle: build over half
    // the corpus, APPEND the other half (no rewrite), probe a derived
    // crawl batch — pairs must equal the all-pairs trigram truth
    // between the WHOLE corpus and the batch, which proves the append
    // path feeds candidates exactly like the build path ----
    "q_dedup_index_probe" -> ((s, d) => {
      import graft.operators.DedupIndex
      val docs = docsPar(s, d).select("doc_id", "text")
        .where(col("text").isNotNull)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx_").toString
      // 16 bands x 2 rows (same 32-hash signature as the 8x4 default):
      // the flattest S-curve the signature affords, because this
      // query's oracle is the ALL-PAIRS truth — the corpus has organic
      // borderline pairs down to j ≈ 0.69, where 8x4 banding has a
      // ~13% miss rate but 16x2 is ≤ 3·10⁻⁵ (deterministic hashes, so
      // the gate outcome is fixed, not flaky — verified green at the
      // driver SF)
      // materialize the probe, then delete the corpus-sized temp index
      // — repeated bench/verify invocations must not accumulate index
      // trees until /tmp fills; the finally covers BUILD and APPEND
      // too, so a failure in any of the three stages cannot leak the
      // tree either (r11 advice; scope widened in r12 review)
      try {
        DedupIndex.build(docs.where(col("doc_id") % 2 === 0),
          "doc_id", "text", tmp, bands = 16, rowsPerBand = 2)
        DedupIndex.append(docs.where(col("doc_id") % 2 === 1),
          "doc_id", "text", tmp)
        val batch = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" crawl extra tail")).as("text"))
        DedupIndex
          .probe(s, tmp, batch, "doc_id", "text", threshold = 0.5)
          .select(col("id"), col("batch_id"),
            (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
          .orderBy("id", "batch_id")
          .localCheckpoint()
      } finally deleteRecursively(new java.io.File(tmp))
    }),

    // ---- the SAME ingest cycle driven down the KEYED (backfill)
    // probe plan: graft.dedupIndex.maxBroadcastBatch=1 forces every
    // batch past the broadcast threshold, so the shuffle-join dataflow
    // earns its own oracle row instead of riding a spec-pinned
    // equality (the q_skew_join precedent) — probe() reads the conf
    // and eagerly materializes before the finally resets it ----
    "q_dedup_index_backfill" -> ((s, d) => {
      import graft.operators.DedupIndex
      val docs = docsPar(s, d).select("doc_id", "text")
        .where(col("text").isNotNull)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx_bf_").toString
      // restore any pre-existing session override instead of
      // clobbering it with unset (r13 advice)
      val priorMax = s.conf.getOption("graft.dedupIndex.maxBroadcastBatch")
      s.conf.set("graft.dedupIndex.maxBroadcastBatch", "1")
      try {
        DedupIndex.build(docs.where(col("doc_id") % 2 === 0),
          "doc_id", "text", tmp, bands = 16, rowsPerBand = 2)
        DedupIndex.append(docs.where(col("doc_id") % 2 === 1),
          "doc_id", "text", tmp)
        val batch = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" crawl extra tail")).as("text"))
        // NO outer localCheckpoint (unlike the broadcast twin): the
        // keyed path already returns an eagerly-checkpointed frame, so
        // the index tree can be deleted, and a second checkpoint would
        // bury the inner one where Caches.releaseResult's leaf walk
        // cannot free it (SoakSpec caught exactly that)
        DedupIndex
          .probe(s, tmp, batch, "doc_id", "text", threshold = 0.5)
          .select(col("id"), col("batch_id"),
            (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
          .orderBy("id", "batch_id")
      } finally {
        priorMax match {
          case Some(p) => s.conf.set("graft.dedupIndex.maxBroadcastBatch", p)
          case None => s.conf.unset("graft.dedupIndex.maxBroadcastBatch")
        }
        deleteRecursively(new java.io.File(tmp))
      }
    }),

    // ---- the SAME ingest cycle driven through a v1→v3 MIGRATION
    // (DedupIndex.rebuildFrom): a synthesized pre-versioned index —
    // flat grams part files, flat band=<k> bands dirs, version-less
    // meta; the DedupIndexSpec synthesis — is migrated in place (pure
    // file moves + the atomic meta mint), then appended and probed.
    // The output must equal the fresh-build cycle, so it shares the
    // all-pairs trigram oracle: the plan a real migration runs earns
    // its own oracle row instead of riding a spec-pinned equality
    // (the q_dedup_index_backfill precedent, r13 verdict #6) ----
    "q_dedup_index_migrate" -> ((s, d) => {
      import graft.operators.DedupIndex
      import s.implicits._
      val docs = docsPar(s, d).select("doc_id", "text")
        .where(col("text").isNotNull)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx_mig_").toString
      try {
        DedupIndex.build(docs.where(col("doc_id") % 2 === 0),
          "doc_id", "text", tmp, bands = 16, rowsPerBand = 2)
        // regress to v1: flatten the grams epoch layout into plain
        // part files, hoist the epoch-tagged band dirs to flat
        // band=<k> (true v1 never tagged them), and strip the meta's
        // version/shingler columns
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val gramsDir = new org.apache.hadoop.fs.Path(s"$tmp/grams")
        val flatTmp = s"${tmp}_flatgrams"
        s.read.parquet(s"$tmp/grams").select("id", "gram_hashes")
          .write.parquet(flatTmp)
        fs.delete(gramsDir, true)
        require(fs.rename(new org.apache.hadoop.fs.Path(flatTmp),
          gramsDir), "v1 synthesis: grams rename failed")
        val bandsDir = new org.apache.hadoop.fs.Path(s"$tmp/bands")
        fs.listStatus(bandsDir)
          .filter(e => e.isDirectory &&
            e.getPath.getName.startsWith("epoch="))
          .foreach { e =>
            fs.listStatus(e.getPath)
              .filter(b => b.isDirectory &&
                b.getPath.getName.startsWith("band="))
              .foreach { b =>
                require(fs.rename(b.getPath,
                  new org.apache.hadoop.fs.Path(bandsDir,
                    b.getPath.getName)),
                  "v1 synthesis: bands hoist failed")
              }
            fs.delete(e.getPath, true)
          }
        Seq((16, 2)).toDF("bands", "rows_per_band")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
        // migrate, then grow and serve exactly like the probe cycle
        DedupIndex.rebuildFrom(s, tmp)
        DedupIndex.append(docs.where(col("doc_id") % 2 === 1),
          "doc_id", "text", tmp)
        val batch = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" crawl extra tail")).as("text"))
        DedupIndex.probe(s, tmp, batch, "doc_id", "text",
            threshold = 0.5)
          .select(col("id"), col("batch_id"),
            (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
          .orderBy("id", "batch_id")
          .localCheckpoint()
      } finally {
        deleteRecursively(new java.io.File(tmp))
        deleteRecursively(new java.io.File(s"${tmp}_flatgrams"))
      }
    }),

    // ---- the SAME ingest cycle driven through COMPACTION (the
    // maintenance verb, r14 verdict #1): build → FIVE separate appends
    // (one tiny epoch each — the per-micro-batch accumulation shape a
    // streaming ingest gate produces) → compact (epochs merge to one,
    // bands rewritten from the compacted grams) → probe. Compaction is
    // pure data movement — no shingling, no re-hashing — so the
    // output shares the same all-pairs trigram truth as the
    // fresh-build cycle (the q_dedup_index_migrate precedent) ----
    "q_dedup_index_compact" -> ((s, d) => {
      import graft.operators.DedupIndex
      val docs = docsPar(s, d).select("doc_id", "text")
        .where(col("text").isNotNull)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx_cmp_").toString
      try {
        DedupIndex.build(docs.where(col("doc_id") % 2 === 0),
          "doc_id", "text", tmp, bands = 16, rowsPerBand = 2)
        Seq(1, 3, 5, 7, 9).foreach { r =>
          DedupIndex.append(docs.where(col("doc_id") % 10 === r),
            "doc_id", "text", tmp)
        }
        DedupIndex.compact(s, tmp)
        val batch = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" crawl extra tail")).as("text"))
        DedupIndex.probe(s, tmp, batch, "doc_id", "text",
            threshold = 0.5)
          .select(col("id"), col("batch_id"),
            (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
          .orderBy("id", "batch_id")
          .localCheckpoint()
      } finally deleteRecursively(new java.io.File(tmp))
    }),

    // ---- the SAME ingest cycle under TIERED maintenance (r15 verdict
    // #1, the serving loop's actual policy): build ⅔ of the corpus →
    // full compact (mints one big epoch) → the remaining ⅓ in five
    // small appends → compact with the tier set just under the big
    // epoch's real bytes, so ONLY the appends merge — the small
    // aggregate is ~half the big epoch, a 2× margin below the
    // promotion bar, so the big epoch is deterministically left in
    // place (the spec pins file-identity; this row pins that the
    // tier-maintained index SERVES exactly the all-pairs trigram
    // truth — partial maintenance must be invisible to probes) ----
    "q_dedup_index_compact_tiered" -> ((s, d) => {
      import graft.operators.DedupIndex
      val docs = docsPar(s, d).select("doc_id", "text")
        .where(col("text").isNotNull)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx_tier_").toString
      try {
        DedupIndex.build(docs.where(col("doc_id") % 3 =!= 0),
          "doc_id", "text", tmp, bands = 16, rowsPerBand = 2)
        DedupIndex.compact(s, tmp) // the big (above-tier) epoch
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        val bigBytes = fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$tmp/grams"))
          .filter(e => e.isDirectory &&
            e.getPath.getName.startsWith("epoch="))
          .map(e => fs.getContentSummary(e.getPath).getLength).max
        Seq(0, 3, 6, 9, 12).foreach { r => // the %3==0 third, 5 slices
          DedupIndex.append(docs.where(col("doc_id") % 15 === r),
            "doc_id", "text", tmp)
        }
        DedupIndex.compact(s, tmp, maxEpochBytes = bigBytes - 1)
        val batch = docs.where(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 300000L).as("doc_id"),
            concat(col("text"), lit(" crawl extra tail")).as("text"))
        DedupIndex.probe(s, tmp, batch, "doc_id", "text",
            threshold = 0.5)
          .select(col("id"), col("batch_id"),
            (floor(col("jaccard") * 1e6) / 1e6).as("jaccard"))
          .orderBy("id", "batch_id")
          .localCheckpoint()
      } finally deleteRecursively(new java.io.File(tmp))
    }),

    // ---- curriculum ordering (Bengio 2009): easy-to-hard difficulty
    // bands with sources round-robin interleaved inside each band —
    // the curriculum is the lexicographic order of the emitted sort
    // keys (no global order index column: that would be a
    // single-partition window); ONE (band, source) window shuffle ----
    "q_curriculum" -> ((s, d) => {
      import graft.operators.DataPrep
      val scored = docsPar(s, d).where(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TextFunctions.prefScore(col("text")).as("difficulty"))
      DataPrep.curriculumOrder(scored, "doc_id", "source",
          col("difficulty"), bandWidth = 2000L, maxBand = 3)
        .select(col("doc_id"), col("source"), col("difficulty"),
          col("band"), col("interleave_rank"))
        .orderBy("band", "interleave_rank", "source", "doc_id")
    }),

    // ---- k-anonymity / l-diversity release gate over
    // (lang, source, length-band) quasi-identifiers: group size,
    // distinct-sensitive count, and the publish verdict — ONE keyed
    // agg of fixed-width group keys ----
    "q_kanon" -> ((s, d) => {
      val qi = docsPar(s, d).select(col("lang"), col("source"),
        expr("n_chars div 500").as("len_band"), col("text"))
      graft.operators.Privacy.kAnonymityStats(qi,
          Seq("lang", "source", "len_band"), "text", k = 5L, l = 2L)
        .orderBy("lang", "source", "len_band")
    }),

    // ---- row-level cell suppression twin: QI cells NULLed in
    // sub-k groups, row count preserved — one window count over the
    // same QI key ----
    "q_kanon_rows" -> ((s, d) => {
      val qi = docsPar(s, d).select(col("doc_id"), col("lang"),
        col("source"), expr("n_chars div 500").as("len_band"))
      graft.operators.Privacy.kAnonymize(qi,
          Seq("lang", "source", "len_band"), k = 5L)
        .orderBy("doc_id")
    }),

    // ---- DSIR importance weights (Xie et al. 2023 data selection):
    // hashed unigram+bigram features, add-one-smoothed target/raw
    // bucket distributions, per-doc quantized log importance weight.
    // Both corpora reduce to <= 4096-row bucket tables (broadcast by
    // construction); the raw side pays one narrow explode + broadcast
    // join. Portable md5 buckets so the oracle replays the exact hash ----
    "q_dsir" -> ((s, d) => {
      import graft.operators.DataPrep
      val docs = docsPar(s, d)
      val target = docs.where(col("source").isin("src0", "src1"))
      DataPrep.dsirWeights(docs, target, "doc_id", "text",
          buckets = 4096, portable = true)
        .orderBy("doc_id")
    }),

    // ---- brute-force cosine top-k (exact ANN baseline) ----
    // ---- IR ranking metrics (recall@k / MRR@k / nDCG@k): the
    // evaluation leg of the retrieval family — brute-force cosine
    // top-10 scored against the same-label relevance truth; DCG
    // discounts come from ONE driver-computed literal table embedded
    // in both engines (Spark log2 = ln/ln2 vs DuckDB's C log2 differ
    // by ulps), ratios are ppm integer divisions ----
    "q_ranking_metrics" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      val ranked = SimilaritySearch.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "vec_id", k = 10)
      val truth = queries
        .select(col("vec_id").as("query_id"), col("label").as("_ql"))
        .join(emb.select(col("vec_id").as("id"), col("label")),
          col("label") === col("_ql"))
        .where(col("id") =!= col("query_id"))
        .select("query_id", "id")
      graft.operators.Relevance.rankingMetrics(ranked, truth,
          "query_id", "id", "rank", k = 10)
        .orderBy("query_id")
    }),

    // ---- the multi-cutoff @1/@5/@10 table off ONE truth join + ONE
    // hit-ordinal window (hit ordinals are k-independent: every
    // predecessor of an in-window hit is also in-window) ----
    "q_ranking_metrics_at" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      val ranked = SimilaritySearch.bruteForceTopK(emb, queries,
        "vec_id", "embedding", "vec_id", k = 10)
      val truth = queries
        .select(col("vec_id").as("query_id"), col("label").as("_ql"))
        .join(emb.select(col("vec_id").as("id"), col("label")),
          col("label") === col("_ql"))
        .where(col("id") =!= col("query_id"))
        .select("query_id", "id")
      graft.operators.Relevance.rankingMetricsAt(ranked, truth,
          "query_id", "id", "rank", ks = Seq(1, 5, 10))
        .orderBy("query_id", "k")
    }),

    // ---- generation-eval metrics: the GENERATION leg of the eval
    // family beside q_ranking_metrics' retrieval leg. chrF is
    // transcendental-free by construction (ppm-quantized per-order
    // P/R BEFORE the order average and F-score — BLEU's exp/ln would
    // never replay across engines); CER rides both engines' NATIVE
    // levenshtein; distinct-n is the mode-collapse detector over the
    // whole corpus. Pairs: evalPairs' two deterministic strata ----
    "q_chrf" -> ((s, d) => {
      graft.operators.EvalMetrics.chrF(evalPairs(s, d), "doc_id",
          "hyp", "ref")
        .orderBy("doc_id")
    }),

    "q_cer" -> ((s, d) => {
      graft.operators.EvalMetrics.cer(evalPairs(s, d), "doc_id",
          "hyp", "ref")
        .orderBy("doc_id")
    }),

    "q_distinct_ngrams" -> ((s, d) => {
      graft.operators.EvalMetrics.distinctN(docsPar(s, d),
          "source", "text")
        .orderBy("source", "n")
    }),

    // ---- approximate distinct-n (the 100 TB twin): the exact form's
    // per-(group, order) count(DISTINCT gram) is the eval family's one
    // unbounded state — its shuffle carries a vocabulary that grows
    // supra-linearly with the corpus (SCALING.md: 5.2x work at 10x on
    // the vocab-growth fixture). The HLL sketch bounds state at
    // |groups|·|orders|·4096 registers at σ≈1.6%, and the estimator
    // replays bit-for-bit in SQL (the q_hll_distinct convention) ----
    "q_distinct_ngrams_approx" -> ((s, d) => {
      graft.operators.EvalMetrics.distinctNApprox(docsPar(s, d),
          "source", "text")
        .orderBy("source", "n")
    }),

    // ---- SQuAD-style token F1 (the QA/distillation span score):
    // clipped token overlap via the native row-local kernel — the
    // chrF zero-shuffle argument at token grain ----
    "q_token_f1" -> ((s, d) => {
      graft.operators.EvalMetrics.tokenF1(evalPairs(s, d), "doc_id",
          "hyp", "ref")
        .orderBy("doc_id")
    }),

    // ---- ROUGE-L (the most-reported summarization metric): LCS
    // P/R/F1 in ppm via the native O(m·n) DP kernel — zero shuffles;
    // the oracle replays the SAME prefix-max recurrence as a
    // recursive-CTE row DP ----
    "q_rouge_l" -> ((s, d) => {
      graft.operators.EvalMetrics.rougeL(evalPairs(s, d), "doc_id",
          "hyp", "ref")
        .orderBy("doc_id")
    }),

    // ---- ROUGE-2 (the trio's n-gram member): clipped bigram overlap
    // P/R/F1 via the same native array kernel — tokenF1 lifted to
    // order-2 grams, zero shuffles ----
    "q_rouge_2" -> ((s, d) => {
      graft.operators.EvalMetrics.rougeN(evalPairs(s, d), "doc_id",
          "hyp", "ref", n = 2)
        .orderBy("doc_id")
    }),

    // ---- ROUGE-Lsum (the rouge-score library's newline-split
    // summary-level metric, r14 verdict #6): per-reference-sentence
    // union-LCS via the alignment-independent ∃-optimal membership
    // test — kernel, spec reference, and the oracle's two recursive
    // prefix/suffix DP CTEs provably agree because the test depends
    // only on DP VALUES, never a backtrack tie-break. The word-soup
    // corpus has no newlines, so the fixture folds each side into
    // 6-word lines (the same fold in both engines) ----
    "q_rouge_lsum" -> ((s, d) => {
      def fold(c: Column): Column = {
        val ws = split(c, " ")
        val nLines = ceil(size(ws) / lit(6.0)).cast("int")
        array_join(
          transform(sequence(lit(0), greatest(nLines - 1, lit(0))),
            j => array_join(slice(ws, j * 6 + 1, lit(6)), " ")), "\n")
      }
      graft.operators.EvalMetrics.rougeLsum(
        evalPairs(s, d).select(col("doc_id"),
          fold(col("hyp")).as("hyp"), fold(col("ref")).as("ref")),
        "doc_id", "hyp", "ref")
        .orderBy("doc_id")
    }),

    // ---- diagonal-Fréchet embedding-distribution distance (the FID
    // construction, per-dim covariance): the DISTRIBUTION-level
    // generation signal — corpus drift in embedding space with no
    // pairing at all. Fixture: even-id embeddings vs odd-id
    // embeddings under a deterministic affine shift (x·1.02 + 0.01),
    // so both the mean and the variance terms are exercised. Exact
    // integer (n, Σq, Σq²) moments per dimension; one fixed double
    // tree on top — the oracle replays it bit-for-bit ----
    "q_embed_fd" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding"))
      val aSide = e.where(col("vec_id") % 2 === 0)
      val bSide = e.where(col("vec_id") % 2 === 1)
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => x * 1.02 + 0.01).as("embedding"))
      graft.operators.EvalMetrics.embedFrechetDiag(aSide, bSide,
        "embedding")
    }),

    // ---- sentence BLEU in LOG space (+1-smoothed, effective-order
    // mean, log brevity penalty): exp() never runs — ln over
    // identical IEEE doubles is the proven q_tfidf/q_ccnet floor(ln)
    // discipline, and one transcendental layer is the exactness
    // budget ----
    "q_log_bleu" -> ((s, d) => {
      graft.operators.EvalMetrics.logBleu(evalPairs(s, d), "doc_id",
          "hyp", "ref")
        .orderBy("doc_id")
    }),

    "q_ann_cosine" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.bruteForceTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- exact maximum-inner-product top-k (the ranking a trained
    // dot-product retriever serves — DPR/ANCE score q·x, not cosine;
    // document norm carries trained signal, so this ordering genuinely
    // differs from q_ann_cosine's). Native codegen'd vec_dot; oracle =
    // DuckDB list_inner_product, bit-identical sequential accumulation ----
    "q_mips" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.mipsTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("dot"), 6).as("dot"))
        .orderBy("query_id", "rank")
    }),

    // ---- Bradley–Terry preference-strength ranking (Hunter 2004 MM):
    // the reward-model data-prep step — banded pairwise matches decided
    // by the integer quality score (ties to the earlier doc), then 5
    // exact-integer MM iterations; two keyed joins + one keyed agg per
    // iteration, one 8-byte normalization scalar ----
    "q_bt_rank" -> ((s, d) => {
      val scored = docsPar(s, d)
        .where(col("doc_id") < 120 && col("text").isNotNull)
        .select(col("doc_id"),
          TextFunctions.prefScore(col("text")).as("score"))
      val a = scored.select(col("doc_id").as("a_id"),
        col("score").as("a_score"))
      val b = scored.select(col("doc_id").as("b_id"),
        col("score").as("b_score"))
      val m = a.join(b,
          col("b_id") > col("a_id") && col("b_id") <= col("a_id") + 4L)
        .select(
          when(col("a_score") >= col("b_score"), col("a_id"))
            .otherwise(col("b_id")).as("winner"),
          when(col("a_score") >= col("b_score"), col("b_id"))
            .otherwise(col("a_id")).as("loser"))
      graft.operators.Graph.bradleyTerryQ6(m, "winner", "loser", iters = 5)
        .orderBy("item")
    }),

    // ---- MMR diversified top-k (Carbonell & Goldstein 1998): greedy
    // λ·rel − (1−λ)·max-sim-to-picked re-rank over each query's top-20
    // candidate pool; integer-quantized dots + ppm λ make every greedy
    // step an exact-BIGINT argmax the oracle replays as a recursive
    // CTE ----
    "q_mmr" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.mmrTopK(emb, queries,
          "vec_id", "embedding", "vec_id",
          k = 8, candidates = 20, lambdaPpm = 700000L)
        .orderBy("query_id", "pick_rank")
    }),

    // ---- ALSH MIPS (Shrivastava & Li 2014 scale path): the asymmetric
    // corpus transform (append sqrt(M²−‖x‖²)) reduces MIPS to the LSH
    // bucket join q_ann_lsh already proved; portable integer buckets so
    // the approximate candidate set itself replays in SQL — the
    // q_ann_lsh discipline applied to inner-product retrieval ----
    "q_mips_alsh" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.mipsAlshTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10, bits = 6,
          portableBuckets = true)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("dot"), 6).as("dot"))
        .orderBy("query_id", "rank")
    }),

    // ---- planner-chosen ALSH bucket width: bits from
    // SimilaritySearch.alshBitsFor over the REAL corpus count (the
    // smallest width holding expected bucket candidates <= 64/query —
    // 3 bits at the 500-row verify corpus, 9 at 10x scale); the oracle
    // replays the width selection, then masks the same 62-plane
    // portable signature down to it ----
    "q_mips_alsh_planned" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.mipsAlshTopKPlanned(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10,
          targetCandidatesPerQuery = 64.0, portableBuckets = true)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("dot"), 6).as("dot"))
        .orderBy("query_id", "rank")
    }),

    // ---- SFT chat-template rendering + loss-mask spans: the training
    // string and the assistant-span offsets come from the SAME concat
    // tree (the drift between render and mask is the bug class this
    // prevents); 2-exchange conversations derived from token quarters
    // (no conversation table in the corpus — the operator takes
    // arbitrary turn columns) ----
    "q_sft_render" -> ((s, d) => {
      import graft.operators.SftFormat
      val turns = SftFormat.quartersFromText(docsPar(s, d), "doc_id", "text")
      SftFormat.renderTwoTurn(turns, "doc_id",
          col("u1"), col("a1"), col("u2"), col("a2"))
        .orderBy("doc_id", "turn")
    }),

    // ---- n-turn SFT rendering (real corpora are variable-length
    // conversations): 1..4-turn conversations derived from each doc's
    // token stream (length = 1 + doc_id % 4, roles alternating
    // user-first), rendered + loss-masked by the general array-of-turns
    // operator. Single-user-turn docs contribute ZERO rows (no
    // assistant span) and short docs exercise empty segments — the
    // edges the two-turn path never hits ----
    "q_sft_render_n" -> ((s, d) => {
      import graft.operators.SftFormat
      val toks = filter(split(trim(col("text")), "\\s+"),
        t => length(t) > 0)
      val base = docsPar(s, d).where(col("text").isNotNull)
        .select(col("doc_id"), toks.as("toks"),
          (lit(1) + col("doc_id") % 4).cast("int").as("nt"))
      val q = size(col("toks"))
      def bound(k: Column): Column =
        floor(q.cast("double") * k.cast("double")
          / col("nt").cast("double")).cast("int")
      val turns = transform(sequence(lit(1), col("nt")), k =>
        struct(
          when(k % 2 === 1, lit("user")).otherwise(lit("assistant"))
            .as("role"),
          concat_ws(" ", slice(col("toks"), bound(k - 1) + 1,
            bound(k) - bound(k - 1))).as("content")))
      SftFormat.renderConversation(
          base.withColumn("_turns", turns), "doc_id", col("_turns"))
        .orderBy("doc_id", "turn")
    }),

    // ---- DPO/RLHF preference-pair construction: i-th-best vs i-th-
    // worst pairing by an exact-integer quality score inside hash-
    // bucketed prompt groups (lang × md5 bucket), equal-score pairs
    // dropped. One keyed shuffle for both windows + a fixed-width
    // (key, pair_idx) join — ≤ k/2 pairs from a k-row group ----
    "q_dpo_pairs" -> ((s, d) => {
      import graft.operators.DataPrep
      val scored = docsPar(s, d)
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(col("doc_id"),
          concat(col("lang"), lit("|"),
            pmod(graft.functions.Hashing.md5Long56(
              concat(lit("dpo|"), col("doc_id").cast("string"))), lit(8L))
              .cast("string")).as("bucket"),
          TextFunctions.prefScore(col("text")).as("score"))
      DataPrep.preferencePairs(scored, "bucket", "doc_id", "score")
        .orderBy("pair_key", "pair_idx")
    }),

    // ---- GRPO group-relative advantages (DeepSeek's group-baseline
    // normalization): (x − group mean)/group σ as ONE exact-integer
    // window — adv_q = floor((n·x − Σx)·10⁶ / sqrt(n·Σx² − (Σx)²)),
    // numerator and radicand exact off one keyed shuffle, so the
    // normalized advantage replays bit-for-bit; zero-variance groups
    // (incl. singletons) emit 0 ----
    "q_grpo_adv" -> ((s, d) => {
      import graft.operators.DataPrep
      val scored = docsPar(s, d)
        .where(col("text").isNotNull && col("lang").isNotNull)
        .select(col("doc_id"),
          concat(col("lang"), lit("|"),
            pmod(graft.functions.Hashing.md5Long56(
              concat(lit("grpo|"), col("doc_id").cast("string"))), lit(8L))
              .cast("string")).as("grp"),
          TextFunctions.prefScore(col("text")).as("score"))
      DataPrep.groupAdvantages(scored, "doc_id", "grp", "score")
        .orderBy("doc_id")
    }),

    // ---- T5/UL2 span corruption (Raffel 2020 §3.1.4): sentinel-masked
    // spans + span targets, in the deterministic 8-token-block variant
    // (independent per-block md5 draws — nothing to reject, fully
    // parallel, relationally replayable; the documented deviation from
    // the paper's serial rejection sampler) ----
    "q_span_corrupt" -> ((s, d) => {
      graft.operators.SpanCorrupt.corrupt(docsPar(s, d), "doc_id", "text",
          maskPct = 40)
        .orderBy("doc_id")
    }),

    // ---- fill-in-the-middle transform (Bavarian 2022, the code-model
    // infilling augmentation): deterministic md5 apply-draw + cut
    // points, PSM sentinel rendering, passthrough otherwise — pure
    // codegen projection whose every emitted example the oracle
    // replays bit-for-bit ----
    "q_fim" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.fimTransform(docsPar(s, d), "doc_id", "text",
          fimRate = 0.5)
        .orderBy("doc_id")
    }),

    // ---- word2vec negative sampling (Mikolov 2013 §2.2): 3 draws per
    // doc from the unigram^(3/4) distribution over the top-50 vocab.
    // Weights via two correctly-rounded sqrts (never pow — not
    // correctly rounded, a floor boundary could flip cross-engine);
    // portable md5 draws; the oracle replays every pick with a range
    // join on the cumulative-weight table ----
    "q_neg_samples" -> ((s, d) => {
      CorpusStats.negativeSamples(docsPar(s, d), "doc_id", "text",
          vocabSize = 50, negatives = 3)
        .orderBy("doc_id", "j")
    }),

    // ---- Aho–Corasick multi-pattern dictionary tagging: the whole
    // lexicon (PII terms / topic lexicons / blocklists) matched in ONE
    // corpus pass — vs |lexicon| regex scans at 100 TB. Substring
    // matches with overlaps (dict-suffix links), which is exactly what
    // a positional SQL replay can verify; lexicon deliberately contains
    // nested patterns (able⊂table, can⊂scan, win⊂window) so the
    // overlap-reporting grain is what the oracle checks ----
    "q_keyword_tags" -> ((s, d) => {
      KeywordTag.tagCounts(docsPar(s, d), "doc_id", "text",
          keywordLexicon)
        .orderBy("tag", "term")
    }),

    // ---- margin-based bitext mining (Artetxe & Schwenk 2019, the
    // LASER/CCMatrix recipe): cross-corpus pairs scored by cosine
    // RELATIVE to each side's k-NN neighborhood — the ratio margin that
    // separates translations from hub vectors where raw cosine cannot.
    // Quantize-then-sum + one integer division make the ranking
    // engine-exact; the oracle replays the whole pipeline ----
    "q_bitext_mine" -> ((s, d) => {
      val emb = embeddings(s, d)
      graft.operators.Bitext.mine(
          emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.15)
        .orderBy("src_id")
    }),

    // ---- the bitext SCALE path as its own gated query: banded
    // portable-LSH candidates (4 × 6-bit slices of one 24-bit
    // signature, any-band match) + the identical margin tail; the
    // oracle recomputes the signature slices in SQL so the approximate
    // candidate set itself is checked (the q_ann_lsh discipline) ----
    "q_bitext_banded" -> ((s, d) => {
      val emb = embeddings(s, d)
      graft.operators.Bitext.mine(
          emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.15,
          bits = Some(6), bands = 4)
        .orderBy("src_id")
    }),

    // ---- planner-chosen banded bitext: the (bits, bands) grid comes
    // from SimilaritySearch.hyperplanePlanFor over the REAL corpus
    // sizes (9x3 at the 250-row verify sides, 13x4 at 1000), so the
    // grid scales with the data instead of flooding at 10x — the
    // oracle replays the PLANNER itself (same cost model, same
    // tie-breaks) before replaying the banding, so a drifted plan
    // fails the gate, not just a drifted bucket ----
    "q_bitext_planned" -> ((s, d) => {
      val emb = embeddings(s, d)
      graft.operators.Bitext.minePlanned(
          emb.where(col("vec_id") % 2 === 0),
          emb.where(col("vec_id") % 2 === 1),
          "vec_id", "embedding", k = 4, minMargin = 1.15,
          targetCosine = 0.99, minCatch = 0.95)
        .orderBy("src_id")
    }),

    // ---- hard-negative mining (DPR/Contriever data prep): per anchor,
    // the top-k most-similar vectors with a DIFFERENT label — the
    // q_ann_cosine plan plus the label-mismatch predicate; the oracle
    // replays the filtered ranking exactly ----
    "q_hard_negatives" -> ((s, d) => {
      val emb = embeddings(s, d)
      val anchors = emb.where(col("vec_id") < 5)
      SimilaritySearch.hardNegatives(emb, anchors,
          "vec_id", "embedding", "label", k = 10)
        .select(col("query_id"), col("id"), col("neg_label"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- IVF ANN (k-means coarse quantizer scale path). The quantizer
    // is deterministic, so the oracle ([[IvfOracle]]) replays the whole
    // assign/probe/rank pipeline in SQL against pinned centroids ----
    "q_ann_ivf" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.ivfTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10, nlist = 8, nprobe = 4)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- the PERSISTED IVF index cycle (r15): AnnIndex.build →
    // compact (cell files rewritten through the manifest-committed
    // stage) → partition-pruned probe, driven against the SAME pinned
    // live-ivfTopK oracle — build trains through the one shared
    // trainOnSample body, and compaction is pure data movement, so
    // the persisted, compacted index must rank exactly like the live
    // operator (the dedup-index family's oracle-sharing convention;
    // until now the persisted ANN index was spec-gated only) ----
    "q_ann_index_compact" -> ((s, d) => {
      import graft.operators.AnnIndex
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ann_idx_cmp_").toString
      try {
        AnnIndex.build(emb, "vec_id", "embedding", tmp, nlist = 8)
        AnnIndex.compact(s, tmp, targetFiles = 4)
        AnnIndex.probe(s, tmp, queries, "vec_id", "embedding",
            k = 10, nprobe = 4)
          .select(col("query_id"), col("id"), col("rank"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("query_id", "rank")
          .localCheckpoint()
      } finally deleteRecursively(new java.io.File(tmp))
    }),

    // ---- the persisted ANN index's drift instrument (r15 verdict
    // #4): build freezes the corpus's per-dim moment registers beside
    // the index; driftSince scores an incoming batch against them —
    // here the odd-id embeddings under the q_embed_fd affine shift
    // (x·1.02 + 0.01), so both the mean and variance terms bind. The
    // moments ride the index tree, but they are a pure function of
    // the corpus, so the oracle replays the whole score from the
    // embeddings table directly (the q_embed_fd SQL with the index's
    // sides: batch = side A, the full build corpus = side B) ----
    "q_ann_drift" -> ((s, d) => {
      import graft.operators.AnnIndex
      val emb = embeddings(s, d)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ann_drift_").toString
      try {
        AnnIndex.build(emb, "vec_id", "embedding", tmp, nlist = 8)
        val batch = emb.where(col("vec_id") % 2 === 1)
          .select(col("vec_id"),
            transform(col("embedding").cast("array<double>"),
              x => x * 1.02 + 0.01).as("embedding"))
        AnnIndex.driftSince(s, tmp, batch, "embedding")
          .localCheckpoint()
      } finally deleteRecursively(new java.io.File(tmp))
    }),

    // ---- the drift signal's REMEDY verb (r16 verdict #2): build →
    // retrain FROM THE STORED VECTORS (the caller no longer holds the
    // corpus frame — the assignments table IS the corpus) → probe the
    // new generation. trainOnSample is order-insensitive (hash-filter
    // + id-ordered take), so retraining over the same logical rows
    // with the same (nlist, seed) reproduces the fresh build's
    // quantizer exactly — the retrained index must rank exactly like
    // the live operator, which is why it shares the pinned-centroid
    // oracle (the q_ann_index_compact convention) ----
    "q_ann_retrain" -> ((s, d) => {
      import graft.operators.AnnIndex
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ann_retrain_").toString
      try {
        AnnIndex.build(emb, "vec_id", "embedding", tmp, nlist = 8)
        AnnIndex.retrain(s, tmp, nlist = 8)
        AnnIndex.probe(s, tmp, queries, "vec_id", "embedding",
            k = 10, nprobe = 4)
          .select(col("query_id"), col("id"), col("rank"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy("query_id", "rank")
          .localCheckpoint()
      } finally deleteRecursively(new java.io.File(tmp))
    }),

    // ---- IVF-PQ ANN (IVFADC, the standard FAISS pairing): coarse cell
    // routing makes the quantized ADC ranking probe-bucket sized instead
    // of corpus-sized — the scale rung above q_ann_pq's exhaustive ADC.
    // Oracle pins unit-space coarse centroids + reuses PqOracle's
    // sub-codebooks (identical training inputs ⇒ identical books) and
    // replays route → encode → ADC → rank in SQL ([[IvfPqOracle]]) ----
    "q_ann_ivfpq" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.ivfPqTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10,
          nlist = graft.queries.IvfPqOracle.nlist,
          nprobe = graft.queries.IvfPqOracle.nprobe,
          m = graft.queries.PqOracle.m,
          ksub = graft.queries.PqOracle.ksub)
        .orderBy("query_id", "rank")
    }),

    // ---- residual IVF-PQ (the paper's full IVFADC, by_residual=true):
    // codes quantize v − centroid(cell) under pinned residual
    // codebooks; the query ADC scores against its per-probed-cell
    // residual. The oracle replays the whole routed residual pipeline
    // ([[IvfPqOracle.templateResidual]]) ----
    "q_ann_ivfpq_res" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.ivfPqTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10,
          nlist = graft.queries.IvfPqOracle.nlist,
          nprobe = graft.queries.IvfPqOracle.nprobe,
          m = graft.queries.PqOracle.m,
          ksub = graft.queries.PqOracle.ksub,
          byResidual = true)
        .orderBy("query_id", "rank")
    }),

    // ---- product-quantization ANN (Jégou et al. 2011): per-subspace
    // codebooks pinned at the gate SF oracle-side ([[PqOracle]], the
    // IvfOracle pattern); the Spark side trains + encodes + ADC-ranks
    // live, with per-subspace contributions floor-quantized so the
    // cross-subspace sum commutes on both engines ----
    "q_ann_pq" -> ((s, d) => {
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.pqTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10,
          m = graft.queries.PqOracle.m,
          ksub = graft.queries.PqOracle.ksub)
        .orderBy("query_id", "rank")
    }),

    // ---- LSH-bucketed ANN (scale path), fully oracle-checked: portable
    // integer-Rademacher buckets are recomputed exactly by the SQL
    // oracle, so candidate sets and ranks must match row for row ----
    "q_ann_lsh" -> ((s, d) => {
      // portable buckets (integer Rademacher projections over the md5 dim
      // hash) → the DuckDB oracle recomputes the exact bucket assignment
      // and candidate set in SQL, making this approximate-path query
      // fully oracle-checked, not rows-only
      val emb = embeddings(s, d)
      val queries = emb.where(col("vec_id") < 5)
      SimilaritySearch.lshTopK(emb, queries,
          "vec_id", "embedding", "vec_id", k = 10, bits = 6,
          portableBuckets = true)
        .select(col("query_id"), col("id"), col("rank"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy("query_id", "rank")
    }),

    // ---- first-iteration BPE merge statistics (tokenizer training):
    // adjacent char-pair counts weighted by word frequency — the corpus
    // reduces ONCE to the weighted vocab, pairs explode on vocab-sized
    // data only ([[Tokenizer]]; the iterative trainer is TokenizerSpec-
    // gated, this pins the statistics every merge decision ranks) ----
    "q_bpe_pairs" -> ((s, d) => {
      Tokenizer.bpePairCounts(docsPar(s, d), "text", topK = 50)
    }),

    // ---- BPE encode with gate-SF-pinned merge rules ([[BpeOracle]], the
    // IvfOracle pattern): the sequential merge application is pinned as
    // word→subword VALUES, everything distributed — subword frequency
    // ranking, id assignment, per-doc (widx,sidx) reassembly — replays
    // live in the SQL oracle, so the encode PLAN is what's checked ----
    "q_bpe_encode" -> ((s, d) => {
      // gate surface is the joined-string twin of input_ids (the
      // q_collect_series discipline): the driver's pandas row-sort cannot
      // hash array cells, so array<int> columns must never reach the gate.
      // Library users call Tokenizer.encode directly for the array form.
      Tokenizer.encode(docsPar(s, d), "doc_id", "text",
          graft.queries.BpeOracle.pinnedRules)
        .select(col("doc_id"),
          array_join(col("input_ids").cast("array<string>"), ",")
            .as("input_ids_csv"))
        .orderBy("doc_id")
    }),

    // ---- tokenize → detokenize round trip: decode(encode(docs)) must
    // equal the whitespace-normalized lower-cased corpus EXACTLY — one
    // driver-green gate over the whole encode path (segmentation, id
    // assignment, positional reassembly) AND the decode inverse (id →
    // subword join, order reconstruction, eow unmarking) ----
    "q_bpe_roundtrip" -> ((s, d) => {
      val docs = docsPar(s, d)
      val rules = graft.queries.BpeOracle.pinnedRules
      // encodeAndVocab: ONE corpus segmentation serves both the id
      // assignment and the decode vocabulary (a separate vocabulary()
      // call would re-segment the whole corpus just to rebuild the
      // identical id map)
      val (encoded, vocab) =
        Tokenizer.encodeAndVocab(docs, "doc_id", "text", rules)
      Tokenizer.decode(encoded, "doc_id", "input_ids", vocab)
        .orderBy("doc_id")
    }),

    // ---- vocabulary Zipf profile: top-30 words with rank + cumulative
    // corpus coverage, floor-quantized (exact-integer cumsum/total →
    // identical IEEE quotient both engines) ----
    "q_vocab_stats" -> ((s, d) => {
      CorpusStats.vocabStats(docsPar(s, d), "text", k = 30)
        .orderBy("rank")
    }),

    // ---- inverted-index build (the IR primitive under BM25): per-term
    // df / total tf / bounded sorted postings head via a WindowGroupLimit
    // top-k, never collect-then-slice ----
    "q_inverted_index" -> ((s, d) => {
      import graft.operators.Relevance
      Relevance.invertedIndex(docsPar(s, d), "doc_id", "text", k = 10)
        .orderBy("term")
    }),

    // ---- positional phrase search over the inverted index's token
    // stream: two 3-word phrases against a corpus with planted
    // occurrences (doc_id % 5 = 0 docs get a doubled 'alpha beta gamma'
    // tail — the overlapping second phrase occurs once, the first
    // twice, so adjacency and overlap-counting are both exercised) ----
    "q_phrase_search" -> ((s, d) => {
      import graft.operators.Relevance
      val docs = docsPar(s, d).select(col("doc_id"),
        when(col("doc_id") % 5 === 0,
          concat(col("text"), lit(" alpha beta gamma alpha beta gamma")))
          .otherwise(col("text")).as("text"))
      val p1 = Relevance.phraseOccurrences(docs, "doc_id", "text",
          Seq("alpha", "beta", "gamma"))
        .withColumn("phrase", lit("alpha beta gamma"))
      val p2 = Relevance.phraseOccurrences(docs, "doc_id", "text",
          Seq("beta", "gamma", "alpha"))
        .withColumn("phrase", lit("beta gamma alpha"))
      p1.unionByName(p2)
        .select("phrase", "doc_id", "n_occurrences")
        .orderBy("phrase", "doc_id")
    }),

    // ---- blocked fuzzy self-join (record linkage): md5-hex fixture
    // names (distinct keys are ~30 edits apart; injected deletion /
    // double-substitution variants are 1-2) so the found pairs are
    // exactly the planted typos; prefix blocks keep the join block-local
    // quadratic, the q_jaccard_pairs contract ----
    "q_fuzzy_pairs" -> ((s, d) => {
      import graft.operators.FuzzyJoin
      val base = graft.Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("rec_id"),
          md5(col("c_custkey").cast("string")).as("name"))
      val dels = base.where(col("rec_id") % 7 === 0)
        .select((col("rec_id") + 1000000L).as("rec_id"),
          substring(col("name"), 1, 31).as("name"))
      val subs = base.where(col("rec_id") % 13 === 0)
        .select((col("rec_id") + 2000000L).as("rec_id"),
          concat(substring(col("name"), 1, 30), lit("zz")).as("name"))
      FuzzyJoin.selfPairs(
          base.unionByName(dels).unionByName(subs), "rec_id", "name")
        .orderBy("id_a", "id_b")
    }),

    // ---- HyperLogLog distinct-count: the WHOLE sketch (bucketing, rank,
    // register max-merge, harmonic estimator, linear-counting fallback)
    // replays in SQL on the portable md5 hash — two scopes exercise both
    // estimator branches: words (high cardinality, raw branch) and
    // source (small-cardinality linear-counting branch) and lineitem
    // line keys (~60k distinct at the gate SF: every bucket hit, raw
    // harmonic-mean branch) ----
    "q_hll_distinct" -> ((s, d) => {
      import graft.operators.Hll
      val docs = docsPar(s, d)
      val words = docs.select(
        explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
      val lines = graft.Tables.lineitem(s, d).select(
        (col("l_orderkey") * 10 + col("l_linenumber"))
          .cast("string").as("k"))
      Hll.estimate(words, col("k")).withColumn("scope", lit("words"))
        .unionByName(Hll.estimate(docs, col("source"))
          .withColumn("scope", lit("source")))
        .unionByName(Hll.estimate(lines, col("k"))
          .withColumn("scope", lit("lineitem")))
        .select("scope", "n_present", "s_scaled", "est_raw_q", "est_q")
        .orderBy("scope")
    }),

    // ---- GROUP-WISE HyperLogLog (beyond ref — the per-domain
    // cardinality report a corpus dashboard runs): one 4096-register
    // sketch per source, distinct words per group, state bounded at
    // |groups|·4096 instead of a count(DISTINCT) shuffling every
    // distinct key. Identical estimator expression to q_hll_distinct,
    // grouped — the oracle replays registers and both estimator
    // branches per group ----
    "q_hll_groups" -> ((s, d) => {
      import graft.operators.Hll
      val words = docsPar(s, d).select(col("source"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
      Hll.estimateByGroups(words, Seq("source"), col("k"))
        .orderBy("source")
    }),

    // ---- reciprocal-rank fusion (Cormack et al. 2009 — the hybrid
    // retrieval staple): fuse a LEXICAL ranking (distinct-word overlap
    // with the query document, the BM25-family signal reduced to its
    // set core) with a SEMANTIC one (brute-force cosine top-10, the
    // q_ann_cosine ranking) via integer 10⁹ div (60 + rank)
    // contributions. The fused ordering is engine-exact; ties break on
    // ascending id ----
    "q_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import graft.operators.{Relevance, SimilaritySearch}
      val words = docsPar(s, d).select(col("doc_id"),
          explode(array_distinct(split(lower(trim(col("text"))), "\\s+")))
            .as("w"))
        .where(length(col("w")) > 0)
      val qwords = words.where(col("doc_id") < 5)
        .select(col("doc_id").as("query_id"), col("w"))
      val lex = words.join(broadcast(qwords), Seq("w"))
        .where(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id").agg(count(lit(1)).as("_j"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id")
            .orderBy(col("_j").desc, col("doc_id"))))
        .where(col("rank") <= 10)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val emb = embeddings(s, d)
      val sem = SimilaritySearch.bruteForceTopK(emb,
          emb.where(col("vec_id") < 5), "vec_id", "embedding", "vec_id",
          k = 10)
        .select(col("query_id"), col("id"), col("rank"))
      Relevance.rrfFuse(Seq(lex, sem), "query_id", "id", "rank")
        .orderBy("query_id", "fused_rank")
    }),

    // ---- per-source unigram KL divergence + cross-entropy vs the rest
    // of the corpus (distribution-shift profile for mixture decisions,
    // the information-theoretic sibling of DSIR): add-one smoothing
    // over the joint vocab, per-word contributions floor-quantized at
    // 1e9 so the sums commute and compare bit-for-bit ----
    "q_kl_divergence" -> ((s, d) => {
      CorpusStats.unigramDivergence(docsPar(s, d), "source", "text")
        .orderBy("slice")
    }),

    // ---- count-min frequency sketch (Cormode & Muthukrishnan): the
    // register file built from ONE corpus word-count pass (weighted
    // build == unit build, CmsSpec-pinned), probe = every word with
    // exact count >= 50; est_n >= exact_n is the CMS one-sided
    // guarantee and every value is exact-integer cross-engine ----
    "q_cms" -> ((s, d) => {
      import graft.operators.Cms
      val counts = docsPar(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("k"))
        .where(length(col("k")) > 0)
        .groupBy("k").agg(count(lit(1)).as("exact_n"))
        .persistTracked
      val regs = Cms.registersWeighted(counts, col("k"), col("exact_n"))
      val probe = counts.where(col("exact_n") >= 50)
      Cms.estimates(regs, probe.select("k"), "k")
        .join(probe, Seq("k"))
        .select(col("k").as("word"), col("exact_n"), col("est_n"))
        .orderBy("word")
    }),

    // ---- power-of-two sequence-length histogram (context-length /
    // packing-budget profile): bucket = binary digit count − 1, an exact
    // integer log2 in both engines (floor(log2(n)) float rounding at
    // 2^k boundaries is libm-dependent) ----
    "q_token_histogram" -> ((s, d) => {
      CorpusStats.tokenHistogram(docsPar(s, d), "text")
        .orderBy("bucket")
    }),

    // ---- LLaMA-style epoch/mixture plan: ppm weights × token budget →
    // per-source target tokens and epochs, all-integer arithmetic ----
    "q_epoch_plan" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.epochPlan(docsPar(s, d), "source",
          TextFunctions.tokenCountWs(col("text")),
          weightsPpm = Seq("src0" -> 400000L, "src1" -> 250000L,
            "src2" -> 150000L, "src3" -> 120000L, "src4" -> 80000L),
          budgetTokens = 10000000L)
        .orderBy("source")
    }),

    // ---- adjacent-bigram PMI (collocation mining): quantized ln over
    // exact count ratios, unigram vocab broadcast back twice, corpus
    // totals in-plan ----
    "q_pmi_bigrams" -> ((s, d) => {
      CorpusStats.bigramPmi(docsPar(s, d), "text", minCount = 5)
        .orderBy("w_a", "w_b")
    }),

    // ---- word2vec skip-gram training pairs (window ±2, min-count 5,
    // t=1e-3 frequency subsampling): the md5(doc:pos) keep draw, the
    // per-doc compaction rank, and the ±window pairing all replay
    // exactly in SQL — membership and counts are row-identical ----
    "q_skipgram_pairs" -> ((s, d) => {
      CorpusStats.skipGramPairs(docsPar(s, d), "doc_id", "text",
          window = 2, minCount = 5, subsampleT = 1e-3)
        .orderBy("w_center", "w_context")
    }),

    // ---- winnowing fingerprints (Schleimer et al., MOSS): per-doc
    // distinct sliding-window minima over char-8-gram hashes, on the
    // DuckDB-portable md5Long56 hash so the oracle replays the exact
    // fingerprint set (production default is xxhash64) ----
    "q_winnow" -> ((s, d) => {
      Winnow.fingerprints(docsPar(s, d), "doc_id", "text", k = 8, w = 10,
          portable = true)
        .orderBy("doc_id", "fp")
    }),

    // ---- deterministic stratified sampling: exactly 20 docs per source,
    // ranked by salted content hash — WindowGroupLimit keeps per-stratum
    // state at top-n, the oracle replays the exact draw ----
    "q_stratified_sample" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.stratifiedSample(docsPar(s, d).select("doc_id", "source"),
          "doc_id", "source", n = 20)
        .orderBy("doc_id")
    }),

    // ---- token-budget-capped priority sampling: per source, keep docs
    // in salted-md5 draw order until the INCLUSIVE running token sum
    // hits the budget — the "fill a 10 B-token budget" curation
    // terminal; caps what training spends (tokens), not doc count.
    // One Exchange(source) running-sum window; the oracle replays the
    // draw, the cumsum, and the straddle-drop cut exactly ----
    "q_token_budget" -> ((s, d) => {
      import graft.operators.DataPrep
      import graft.functions.TextFunctions
      DataPrep.tokenBudgetSample(docsPar(s, d), "doc_id", "source",
          TextFunctions.tokenCountWs(col("text")), budgetTokens = 800)
        .orderBy("doc_id")
    }),

    // ---- packing-efficiency profile at context length 64: examples and
    // padding waste under pad-to-context vs cross-boundary packing —
    // all-integer `div` arithmetic (padded = Σ ceil(nᵢ/L), packed =
    // ceil(Σnᵢ/L)), efficiency = one exact-integer division ----
    "q_pack_efficiency" -> ((s, d) => {
      import graft.operators.DataPrep
      import graft.functions.TextFunctions
      DataPrep.packEfficiency(docsPar(s, d), "source",
          TextFunctions.tokenCountWs(col("text")), ctxLen = 64)
        .orderBy("source")
    }),

    // ---- per-doc unigram log-probability (CCNet-style LM quality
    // floor): per-token contributions floor-quantized to exact integers
    // so the per-doc sum commutes — a float sum over an unordered reduce
    // would be run-order-dependent (the q_bm25 discipline) ----
    "q_unigram_logprob" -> ((s, d) => {
      CorpusStats.unigramLogProb(docsPar(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- per-doc smoothed bigram log-probability (the next LM-quality
    // rung above q_unigram_logprob): add-one-smoothed conditional
    // probabilities, integer-quantized per-bigram so doc sums commute ----
    "q_bigram_logprob" -> ((s, d) => {
      CorpusStats.bigramLogProb(docsPar(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- interpolated Kneser-Ney bigram log-probability (Chen &
    // Goodman 1999 — the smoothing CCNet-grade perplexity filters
    // actually use): absolute discount D=0.75 (exact in binary) +
    // continuation-probability backoff; every input is an exact integer
    // and the arithmetic tree is mirrored op-for-op in the oracle, so
    // the quantized contributions match bit-for-bit ----
    "q_kn_logprob" -> ((s, d) => {
      CorpusStats.knLogProb(docsPar(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- interpolated Kneser-Ney TRIGRAM log-probability (full Chen &
    // Goodman recursion, lower orders from continuation counts of the
    // order above — one rung up from q_kn_logprob toward CCNet's 5-gram
    // KenLM): same exact-integer inputs + op-for-op mirrored arithmetic
    // tree, so quantized contributions match bit-for-bit ----
    "q_kn3_logprob" -> ((s, d) => {
      CorpusStats.kn3LogProb(docsPar(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- interpolated Kneser-Ney 5-GRAM log-probability — the full
    // CCNet grain (their KenLM perplexity filter is a 5-gram model).
    // Four backoff levels, each lower order a grouped row-count of the
    // order above; same exact-integer + op-for-op-mirrored-tree
    // discipline as q_kn_logprob/q_kn3_logprob ----
    "q_kn5_logprob" -> ((s, d) => {
      CorpusStats.kn5LogProb(docsPar(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- CCNet perplexity banding (Wenzek et al. 2020): kn5 scores →
    // nearest-rank band bounds from a bounded md5-draw sample →
    // head/middle/tail labels — the LM-quality partition CCNet feeds
    // into data selection. Bounds are order statistics, not interpolated
    // percentiles, so the cross-engine compare is integer-exact ----
    "q_ccnet_bands" -> ((s, d) => {
      CorpusStats.perplexityBands(docsPar(s, d), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- bag-of-words dedup: the key is the sorted token multiset, so
    // word-order permutations (injected here as the sorted-token
    // rendering of every doc_id%9=0 doc) fall into one group; the oracle
    // groups by the sorted token STRING itself, proving the md5-keyed
    // plan loses nothing ----
    "q_bow_dedup" -> ((s, d) => {
      val docs = docsPar(s, d).select("doc_id", "text")
      val shuffled = docs.where(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 300000).as("doc_id"),
          concat_ws(" ", array_sort(filter(
            split(lower(trim(col("text"))), "\\s+"),
            t => length(t) > 0))).as("text"))
      Dedup.bowDupGroups(docs.unionByName(shuffled), "doc_id", "text")
        .select("canonical_id", "n_bow_dups")
        .orderBy("canonical_id")
    }),

    // ---- contiguous global sequence ids (training sample indexing):
    // range-repartition + zipWithIndex — NOT the single-partition global
    // row_number window; the oracle IS that row_number, proving the
    // distributed plan meets the same contract ----
    "q_contiguous_ids" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.contiguousIds(docsPar(s, d).select("doc_id", "source"),
          "doc_id")
        .orderBy("doc_id")
    }),

    // ---- GPT-style training-example assembly, the terminal artifact of
    // tokenize-and-pack: pinned-rule BPE encode → per-source EOS-joined
    // token stream in doc order → exclusive-prefix-sum offsets → fixed
    // 64-token examples crossing doc boundaries. The oracle replays the
    // WHOLE composition from the pinned segmentation ----
    "q_train_examples" -> ((s, d) => {
      import graft.operators.DataPrep
      val docs = docsPar(s, d)
      val enc = Tokenizer.encode(docs, "doc_id", "text",
        graft.queries.BpeOracle.pinnedRules)
      DataPrep.trainExamples(
          enc.join(docs.select("doc_id", "source"), Seq("doc_id")),
          "doc_id", "source")
        .orderBy("source", "example_idx")
    }),

    // ---- temperature mixture sampling (α = 0.5): keep rates derived
    // from corpus shares so output composition follows p^α — integer-
    // quantized group weights, one double rate expression over exact
    // ints, row decisions in integer hash space; the oracle replays the
    // whole derivation ----
    "q_mixture_temperature" -> ((s, d) => {
      import graft.operators.DataPrep
      // the corpus' sources are exactly uniform, where p^α rebalancing
      // is indistinguishable from a flat targetFrac — fold the long tail
      // into one majority group (deterministic, mirrored in the oracle)
      // so the gate actually exercises the sqrt math
      val skewed = docsPar(s, d).select(col("doc_id"),
        when(col("source").isin("src0", "src1"), col("source"))
          .otherwise(lit("src_major")).as("source"))
      DataPrep.temperatureSample(skewed, "doc_id", "source")
        .select("doc_id", "source", "keep_thresh")
        .orderBy("doc_id")
    }),

    // ---- deterministic epoch shuffle (training-data ordering): global
    // permutation by salted md5 draw, positions stamped by
    // range-repartition + zipWithIndex (the q_contiguous_ids mechanism —
    // never a one-task window); the oracle replays the identical draw ----
    "q_corpus_shuffle" -> ((s, d) => {
      import graft.operators.DataPrep
      DataPrep.deterministicShuffle(
          docsPar(s, d).select("doc_id", "source"), "doc_id", "epoch0-")
        .orderBy("doc_id")
    }),

    // ---- unigram-LM (SentencePiece) seed vocabulary: all substrings
    // (len ≤ 4) of the marker-prefixed words, weighted by occurrence ×
    // word freq — all single chars plus the top-200 multi-char
    // candidates on the total order (w × len desc, piece asc). One
    // corpus-sized word reduction, then vocab-local substring explode ----
    "q_sp_vocab" -> ((s, d) => {
      import graft.operators.UnigramLm
      UnigramLm.seedVocab(docsPar(s, d), "text", maxPieceLen = 4,
          multiSeeds = 200)
        .orderBy("piece")
    }),

    // ---- unigram-LM tokenize → detokenize round trip: hard-EM training
    // (Viterbi counts over the distinct-word vocab under broadcast piece
    // scores), Viterbi encode, marker-driven decode — must reproduce the
    // whitespace-normalized lower-cased corpus EXACTLY (the
    // q_bpe_roundtrip discipline for the second tokenizer family) ----
    "q_sp_roundtrip" -> ((s, d) => {
      import graft.operators.UnigramLm
      val docs = docsPar(s, d)
      val m = UnigramLm.train(docs, "text", vocabSize = 300,
        emIters = 2, multiSeeds = 500)
      UnigramLm.decode(UnigramLm.encode(docs, "doc_id", "text", m),
          "doc_id", "input_ids", m)
        .orderBy("doc_id")
    }),

    // ---- C4 line-level cleaning (Raffel et al. 2020 §2.2): the
    // published Common-Crawl→C4 heuristics over deterministic synthetic
    // page structure (the corpus has no lines/punctuation of its own —
    // pageText plants terminal-punct, javascript, lorem-ipsum and brace
    // violations; same expression in the oracle CTE). One narrow
    // codegen-HOF pass, no shuffle ----
    "q_c4_clean" -> ((s, d) => {
      import graft.operators.Curation
      val pages = docsPar(s, d).select(col("doc_id"),
        pageText(col("doc_id"), col("text")).as("page"))
      Curation.c4LineClean(pages, "doc_id", "page")
        .orderBy("doc_id")
    }),

    // ---- one distributed Lloyd k-means step (the full-corpus IVF
    // trainer): floor-quantized integer vectors, broadcast-centroid
    // row-local assignment, one map-side-combining aggregation whose
    // shuffle carries only k (count, Σvec) partials. Init is the
    // portable (md5(id), id) draw; the oracle replays init, the
    // lowest-index-tie-break assignment, and the floor(sum/count)
    // update exactly ----
    "q_kmeans_iter" -> ((s, d) => {
      import graft.operators.KMeans
      import s.implicits._
      val e = embeddings(s, d)
      val cs = KMeans.initCentroids(e, "vec_id", "embedding", 8, 1024)
      KMeans.iterate(e, "embedding", 1024, cs)
        .flatMap { case (c, n, vec) =>
          vec.zipWithIndex.map { case (v, j) =>
            (c.toLong, n, j.toLong, v)
          }
        }.toSeq
        .toDF("cluster_id", "n_assigned", "dim_idx", "centroid_q")
        .orderBy("cluster_id", "dim_idx")
    }),

    // ---- cluster-balanced subsampling (the SemDeDup/DoReMi-adjacent
    // balancing step): assign every embedding to its nearest seed
    // centroid, then keep a deterministic equal-size sample per
    // cluster — caps any one semantic region's share of the corpus.
    // Assignment is a broadcast-centroid narrow map (zero shuffle);
    // the per-cluster cap is the stratifiedSample WindowGroupLimit ----
    "q_cluster_balance" -> ((s, d) => {
      import graft.operators.{DataPrep, KMeans}
      val e = embeddings(s, d)
      val cs = KMeans.initCentroids(e, "vec_id", "embedding", 8, 1024)
      val assigned = KMeans.assign(e, "embedding", 1024, cs)
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"))
      DataPrep.stratifiedSample(assigned, "vec_id", "cluster",
          n = 20, salt = "cbal|")
        .orderBy("cluster", "vec_id")
    }),

    // ---- SemDeDup (Abbas et al. 2023): cluster-scoped semantic dedup
    // — the paper's own pairing mechanism (k-means cells bound pair
    // formation: n²/k candidates, never corpus-all-pairs; the LSH
    // sibling is Dedup.dropEmbeddingDups) with the keep-the-outlier
    // representative policy (lowest centroid cosine, ties to min id).
    // Same injected exact copies as q_embed_dedup so the dedup has
    // real work; the oracle replays assignment, cluster-scoped pairs,
    // the recursive component closure, AND the keep pick ----
    "q_semdedup" -> ((s, d) => {
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          col("embedding")))
      graft.operators.SemDedup.verdicts(corpus, "vec_id", "embedding",
          k = 8, threshold = 0.99)
        .orderBy("vec_id")
    }),

    // ---- SemDeDup with 2-cell multi-probe (r14): the boundary-recall
    // knob's plan — pair formation probes each row's TWO nearest
    // cells, multi-met pairs dedup at their smallest shared cell —
    // earns its own oracle row rather than riding SemDedupSpec alone:
    // the oracle replays the rn <= 2 assignment, the min-common-cell
    // pair dedup, the closure, and the (still 1-nearest) keep pick ----
    "q_semdedup_probe2" -> ((s, d) => {
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          col("embedding")))
      graft.operators.SemDedup.verdicts(corpus, "vec_id", "embedding",
          k = 8, threshold = 0.99, probeCells = 2)
        .orderBy("vec_id")
    }),

    // ---- SemDeDup under the PLANNED k (the q_bitext_planned
    // convention applied to the r13 planner): k = semdedupKFor(n)
    // from the corpus's REAL row count, so the cell budget — and with
    // it the n²/k pair bound — scales with the corpus instead of
    // being a hard-coded 8. Oracle k is generated by the SAME Scala
    // planner at the gate count (Verify omits it at other SFs — the
    // Spark side recounts per-corpus) ----
    "q_semdedup_planned" -> ((s, d) => {
      import graft.operators.SemDedup
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          col("embedding")))
      val k = SemDedup.semdedupKFor(corpus.count(),
        targetCellRows = 64L)
      SemDedup.verdicts(corpus, "vec_id", "embedding",
          k = k, threshold = 0.99)
        .orderBy("vec_id")
    }),

    // ---- the 2-probe plan under its probeCells-AWARE planned k (r14
    // verdict #3): multi-probe pair formation joins on PROBED
    // occupancy (probeCells·n rows over k cells), so the planner
    // scales the cell budget by probeCells — a user turning on the
    // recall knob after planning k no longer silently doubles
    // per-cell load. Oracle k from the SAME Scala planner at the gate
    // count (Verify omits it off-gate — the q_semdedup_planned rule) ----
    "q_semdedup_probe2_planned" -> ((s, d) => {
      import graft.operators.SemDedup
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val corpus = e.unionByName(e.where(col("vec_id") % 20 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          col("embedding")))
      val k = SemDedup.semdedupKFor(corpus.count(),
        targetCellRows = 64L, probeCells = 2)
      SemDedup.verdicts(corpus, "vec_id", "embedding",
          k = k, threshold = 0.99, probeCells = 2)
        .orderBy("vec_id")
    }),

    // ---- corpus-level exact line dedup (MassiveText/RefinedWeb): every
    // distinct line keeps only its (min doc, min idx) occurrence. Pages
    // are seeded by doc_id % 100000 so the injected exact copies
    // (+100000) produce IDENTICAL pages (all lines dup away) and the
    // near copies (+200000) share all but their final line. The oracle
    // replays the argmin keyed by line TEXT — the hashed plan proven
    // lossless (q_ngram_span_dedup discipline) ----
    "q_para_dedup" -> ((s, d) => {
      val pages = docsWithDups(s, d).select(col("doc_id"),
        pageText(col("doc_id") % 100000, col("text")).as("page"))
      Dedup.lineDedup(pages, "doc_id", "page")
        .orderBy("doc_id")
    }))

  /** DuckDB twin of [[TextFunctions.langId]] + [[TextFunctions.qualityScore]]
    * — generated from the SAME stopword tables so the two can't drift. The
    * lang pick mirrors Spark's array_max over (hits, lang) structs: max
    * hits, ties to the lexicographically greatest lang (checked in
    * reverse-lex order). */
  private val langQualityOracle: String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(",")
    val langs = TextFunctions.langStopwords.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, ws) =>
      s"len(list_filter(toks, x -> x IN (${inList(ws)}))) AS h_$l"
    }.mkString(",\n    ")
    val caseArms = langs.map(_._1).sorted.reverse
      .map(l => s"WHEN h_$l = m THEN '$l'").mkString("\n      ")
    s"""WITH t AS (
       |  SELECT doc_id, text,
       |    string_split_regex(lower(trim(text)), '\\s+') AS toks
       |  FROM documents
       |), h AS (
       |  SELECT doc_id, text, toks,
       |    $hitCols
       |  FROM t
       |), scored AS (
       |  SELECT doc_id, text,
       |    greatest(${langs.map("h_" + _._1).mkString(", ")}) AS m,
       |    ${langs.map("h_" + _._1).mkString(", ")},
       |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS len_score,
       |    greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))
       |        AS DOUBLE) / length(text) END) * 4) AS punct_score,
       |    greatest(0.0, 1.0 - (CASE
       |      WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
       |        / length(regexp_replace(text, '[^A-Za-z]', '', 'g')) END) * 2)
       |      AS case_score,
       |    least((CASE WHEN len(toks) = 0 OR (len(toks) = 1 AND toks[1] = '')
       |      THEN 0.0
       |      ELSE CAST(h_en AS DOUBLE) / len(toks) END) * 5, 1.0) AS stop_score
       |  FROM h
       |)
       |SELECT doc_id,
       |  CASE WHEN m = 0 THEN 'und'
       |      $caseArms
       |      ELSE 'und' END AS lang_detected,
       |  floor((len_score + punct_score + case_score + stop_score) / 4 * 1e6)
       |    / 1e6 AS quality,
       |  count(*) OVER (PARTITION BY
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
       |    AS n_same_fingerprint
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  /** DuckDB twin of the q_curation_funnel filter stack — sub-score
    * expressions copied verbatim from [[langQualityOracle]] (proven
    * bit-exact there), stopword tables generated from the source of
    * truth. */
  private val curationOracle: String = {
    def inList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString(",")
    val langs = TextFunctions.langStopwords.toSeq.sortBy(_._1)
    val hitCols = langs.map { case (l, ws) =>
      s"len(list_filter(toks, x -> x IN (${inList(ws)}))) AS h_$l"
    }.mkString(",\n    ")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |    CASE WHEN doc_id % 11 = 0 THEN text || ' ' || text
       |         WHEN doc_id % 13 = 0 THEN text || ' mail me: x' ||
       |           CAST(doc_id AS VARCHAR) || '@spam.net'
       |         ELSE text END AS text
       |  FROM documents
       |), t AS (
       |  SELECT doc_id, source, text,
       |    string_split_regex(lower(trim(text)), '\\s+') AS toks,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
       |      ' ') AS tk
       |  FROM d
       |), h AS (
       |  SELECT doc_id, source, text, toks, tk,
       |    $hitCols
       |  FROM t
       |), scored AS (
       |  SELECT doc_id, source, text, tk,
       |    greatest(${langs.map("h_" + _._1).mkString(", ")}) AS m,
       |    least(CAST(length(text) AS DOUBLE) / 200.0, 1.0) AS len_score,
       |    greatest(0.0, 1.0 - (CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g'))
       |        AS DOUBLE) / length(text) END) * 4) AS punct_score,
       |    greatest(0.0, 1.0 - (CASE
       |      WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
       |        / length(regexp_replace(text, '[^A-Za-z]', '', 'g')) END) * 2)
       |      AS case_score,
       |    least((CASE WHEN len(toks) = 0 OR (len(toks) = 1 AND toks[1] = '')
       |      THEN 0.0
       |      ELSE CAST(h_en AS DOUBLE) / len(toks) END) * 5, 1.0) AS stop_score,
       |    greatest(len(tk) - 2, 0) AS rep_total,
       |    len(list_distinct(list_transform(range(1, len(tk) - 1),
       |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS rep_distinct,
       |    len(regexp_extract_all(text,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) +
       |    len(regexp_extract_all(text,
       |      '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) +
       |    len(regexp_extract_all(text, '[0-9]{3}-[0-9]{3}-[0-9]{4}'))
       |      AS n_pii
       |  FROM h
       |)
       |SELECT source,
       |  CASE WHEN m = 0 THEN 'drop_lang'
       |       WHEN (len_score + punct_score + case_score + stop_score) / 4
       |         < 0.4 THEN 'drop_quality'
       |       WHEN (CASE WHEN rep_total <= 0 THEN 0.0
       |         ELSE CAST(rep_total - rep_distinct AS DOUBLE) / rep_total END)
       |         > 0.2 THEN 'drop_repetition'
       |       WHEN n_pii > 0 THEN 'drop_pii'
       |       ELSE 'keep' END AS verdict,
       |  count(*) AS n
       |FROM scored
       |GROUP BY source, verdict
       |ORDER BY source, verdict""".stripMargin
  }

  /** All-pairs SimHash truth in SQL: recomputes each doc's 64-bit
    * signature from the same distinct 5-char shingles over the portable
    * md5 hash (DuckDB `md5_number_upper` == Dedup.hash64Md5 bits), then
    * takes every pair with Hamming <= 7. Spark must emit exactly this set
    * — which also proves the chunk blocking dropped nothing.
    *
    * Known limit: shingle offsets count UTF-16 units in the JVM and
    * codepoints in DuckDB, so the twins diverge on astral-plane (non-BMP)
    * characters — fine on this corpus (ASCII), flagged for real-world
    * text (normalize or shingle on codepoints before relying on the SQL
    * twin there). */
  private val simhashOracle: String = {
    val bitSums = (0 until 64).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS c$j")
      .mkString(",\n    ")
    // two's complement assembly in plain BIGINT: bit 63 contributes the
    // sign term, bits 0..62 their positive powers
    val sigExpr = ((0 until 63).map(j =>
      s"CASE WHEN c$j > 0 THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END") :+
      "CASE WHEN c63 > 0 THEN (CAST(-9223372036854775807 AS BIGINT) - 1) ELSE CAST(0 AS BIGINT) END")
      .mkString(" +\n    ")
    docsWithDupsCte + s""", norm AS (
  SELECT doc_id,
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM docs
), sh AS (
  SELECT doc_id,
    unnest(list_distinct(list_transform(range(1, length(t) - 5 + 2),
      i -> substr(t, i, 5)))) AS g
  FROM norm WHERE length(t) >= 5
), hs AS (
  SELECT doc_id, md5_number_upper(g) AS h FROM sh
), bits AS (
  SELECT doc_id,
    $bitSums
  FROM hs GROUP BY doc_id
), sigagg AS (
  SELECT doc_id,
    $sigExpr AS sig
  FROM bits
), sig AS (
  -- docs with no shingles (text shorter than 5 after normalization) get
  -- the empty-input signature 0, matching the Spark kernel
  SELECT d.doc_id, coalesce(s.sig, 0) AS sig
  FROM docs d LEFT JOIN sigagg s USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 7
ORDER BY id_a, id_b"""
  }

  /** Exact SQL twin of the portable-bucket LSH ANN: recompute each
    * vector's integer Rademacher projections (bit p of the per-dimension
    * md5 hash picks the sign; the vector is floor(x·1e6)-quantized), join
    * on equal buckets, rank by the same cosine. All bucket math is
    * integer-exact, so the candidate sets must match row for row. */
  private val annLshOracle: String = {
    val sigTerms = sigTermsSql(6)
    s"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), qh AS (
  SELECT vec_id, v,
    list_transform(range(1, len(v) + 1),
      i -> CAST(floor(v[i] * 1e6) AS BIGINT)) AS q,
    list_transform(range(1, len(v) + 1),
      i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
  FROM e
), sigs AS (
  SELECT vec_id, v,
    $sigTerms AS bucket
  FROM qh
), qry AS (
  SELECT vec_id AS query_id, v AS qv, bucket FROM sigs WHERE vec_id < 5
), scored AS (
  SELECT qry.query_id, s.vec_id AS id,
    list_cosine_similarity(s.v, qry.qv) AS cosine
  FROM sigs s JOIN qry ON s.bucket = qry.bucket
  WHERE s.vec_id != qry.query_id
), ranked AS (
  SELECT query_id, id, cosine,
    row_number() OVER (PARTITION BY query_id
      ORDER BY cosine DESC, id) AS rank
  FROM scored
)
SELECT query_id, id, rank, round(cosine, 6) AS cosine
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  /** Exact SQL twin of the portable-bucket ALSH MIPS: replays the
    * asymmetric transform itself — corpus vectors gain one quantized
    * dimension floor(sqrt(m2q − Σq²)) (m2q = corpus max quantized
    * norm², ONE scalar agg) before the integer-Rademacher signature;
    * queries sign the plain un-augmented vector (their appended 0
    * contributes nothing to any projection). All bucket math is
    * integer-exact and the re-rank score is the sequentially-accumulated
    * inner product, so candidate sets and ranks match row for row. */
  private val mipsAlshOracle: String = {
    val sigTerms = sigTermsSql(6)
    s"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), qh AS (
  SELECT vec_id, v,
    list_transform(range(1, len(v) + 1),
      i -> CAST(floor(v[i] * 1e6) AS BIGINT)) AS qb
  FROM e
), norms AS (
  SELECT vec_id, v, qb,
    CAST(list_sum(list_transform(qb, x -> x * x)) AS BIGINT) AS n2
  FROM qh
), m AS (
  SELECT max(n2) AS m2q FROM norms
), corp AS (
  SELECT vec_id, v,
    list_append(qb, CAST(floor(sqrt(CAST(greatest(m2q - n2, 0) AS DOUBLE)))
      AS BIGINT)) AS q,
    list_transform(range(1, len(qb) + 2),
      i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
  FROM norms CROSS JOIN m
), qry0 AS (
  SELECT vec_id, v, qb AS q,
    list_transform(range(1, len(qb) + 1),
      i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
  FROM norms WHERE vec_id < 5
), csig AS (
  SELECT vec_id, v,
    $sigTerms AS bucket
  FROM corp
), qsig AS (
  SELECT vec_id AS query_id, v AS qv,
    $sigTerms AS bucket
  FROM qry0
), scored AS (
  SELECT qsig.query_id, c.vec_id AS id,
    list_inner_product(c.v, qsig.qv) AS dot
  FROM csig c JOIN qsig ON c.bucket = qsig.bucket
  WHERE c.vec_id != qsig.query_id
), ranked AS (
  SELECT query_id, id, dot,
    row_number() OVER (PARTITION BY query_id
      ORDER BY dot DESC, id) AS rank
  FROM scored
)
SELECT query_id, id, rank, round(dot, 6) AS dot
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  /** Planner-driven ALSH twin: replays
    * [[graft.operators.SimilaritySearch.alshBitsFor]] (the smallest
    * width with n·0.5^bits ≤ 64 — exact powers of two, so the argmin
    * is engine-identical) as a CTE, then masks the same 62-plane
    * portable signature down to the planned width; otherwise the
    * mipsAlshOracle pipeline verbatim. */
  private val mipsAlshPlannedOracle: String = {
    val sigTerms = sigTermsSql(62)
    s"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), pl AS (
  SELECT COALESCE((SELECT min(g.bits)
    FROM (SELECT unnest(range(1, 63)) AS bits) g
    WHERE (SELECT count(*) FROM e) * pow(0.5, g.bits) <= 64), 62)
    AS bits
), qh AS (
  SELECT vec_id, v,
    list_transform(range(1, len(v) + 1),
      i -> CAST(floor(v[i] * 1e6) AS BIGINT)) AS qb
  FROM e
), norms AS (
  SELECT vec_id, v, qb,
    CAST(list_sum(list_transform(qb, x -> x * x)) AS BIGINT) AS n2
  FROM qh
), m AS (
  SELECT max(n2) AS m2q FROM norms
), corp AS (
  SELECT vec_id, v,
    list_append(qb, CAST(floor(sqrt(CAST(greatest(m2q - n2, 0) AS DOUBLE)))
      AS BIGINT)) AS q,
    list_transform(range(1, len(qb) + 2),
      i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
  FROM norms CROSS JOIN m
), qry0 AS (
  SELECT vec_id, v, qb AS q,
    list_transform(range(1, len(qb) + 1),
      i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
  FROM norms WHERE vec_id < 5
), csig AS (
  SELECT vec_id, v,
    ($sigTerms) & ((CAST(1 AS BIGINT) << pl.bits) - 1) AS bucket
  FROM corp CROSS JOIN pl
), qsig AS (
  SELECT vec_id AS query_id, v AS qv,
    ($sigTerms) & ((CAST(1 AS BIGINT) << pl.bits) - 1) AS bucket
  FROM qry0 CROSS JOIN pl
), scored AS (
  SELECT qsig.query_id, c.vec_id AS id,
    list_inner_product(c.v, qsig.qv) AS dot
  FROM csig c JOIN qsig ON c.bucket = qsig.bucket
  WHERE c.vec_id != qsig.query_id
), ranked AS (
  SELECT query_id, id, dot,
    row_number() OVER (PARTITION BY query_id
      ORDER BY dot DESC, id) AS rank
  FROM scored
)
SELECT query_id, id, rank, round(dot, 6) AS dot
FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"""
  }

  /** `bits`-bit integer-Rademacher signature terms over per-row `q`
    * (quantized vector) and `h` (per-dimension md5) list columns — the
    * annLshOracle expression, parameterized on width for the banded
    * bitext replay. */
  private def sigTermsSql(bits: Int): String = (0 until bits).map { p =>
    // bit 63: DuckDB's checked shift rejects 1 << 63, so the sign bit
    // is written as the min-BIGINT literal (same bit pattern Spark's
    // 1L << 63 produces); the sum then wraps into the same two's-
    // complement value on both engines
    val bitLit =
      if (p == 63) "CAST(-9223372036854775808 AS BIGINT)"
      else s"(CAST(1 AS BIGINT) << $p)"
    s"""CASE WHEN list_sum(list_transform(range(1, len(q) + 1),
       |      i -> CASE WHEN (h[i] >> $p) & 1 = 1 THEN q[i] ELSE -q[i] END)) >= 0
       |    THEN $bitLit ELSE CAST(0 AS BIGINT) END"""
      .stripMargin
  }.mkString(" +\n    ")

  /** Candidate CTE body for the banded bitext oracle: one 24-bit
    * portable signature per side, sliced into 4 × 6-bit band buckets,
    * pairs = any-band bucket match, deduped on the pair key — the exact
    * SQL twin of Bitext.mine's `bits = Some(6), bands = 4` path. */
  private val bitextBandedCandidates: String = {
    val sig = sigTermsSql(24)
    // one template for both sides so a banding-arithmetic edit cannot
    // land on only one of them (a hard-to-localize parity failure)
    def bandedSide(table: String, idCol: String, vecCol: String) =
      s"""SELECT $idCol, j AS band, (sig >> (j * 6)) & 63 AS bucket
      FROM (
        SELECT $idCol, $sig AS sig
        FROM (
          SELECT $idCol,
            list_transform(range(1, len($vecCol) + 1),
              i -> CAST(floor($vecCol[i] * 1e6) AS BIGINT)) AS q,
            list_transform(range(1, len($vecCol) + 1),
              i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
          FROM $table)
      ) CROSS JOIN (SELECT unnest(range(4)) AS j)"""
    s"""SELECT c.src_id, a2.va, c.tgt_id, b2.vb
  FROM (
    SELECT DISTINCT ab.src_id, bb.tgt_id
    FROM (
      ${bandedSide("a", "src_id", "va")}
    ) ab
    JOIN (
      ${bandedSide("b", "tgt_id", "vb")}
    ) bb ON ab.band = bb.band AND ab.bucket = bb.bucket
  ) c
  JOIN a a2 USING (src_id)
  JOIN b b2 USING (tgt_id)"""
  }

  /** Candidate CTE for the PLANNER-driven banded bitext oracle: first
    * replays [[graft.operators.SimilaritySearch.hyperplanePlanFor]]
    * itself — same feasibility tests, same cost model
    * (bands·(nA+nB) + bands·p₀^bits·nA·nB), same (cost, bands, bits)
    * tie-break — then slices a 64-plane portable signature by the
    * planned grid. p₀ is exactly 0.5 in both engines (acos(0) = π/2 in
    * the same doubles) and the cost terms are integer·2⁻ᵇ products, so
    * the argmin is bit-identical; a drifted planner constant fails the
    * gate before any bucket is compared. */
  private val bitextPlannedCandidates: String = {
    val sig = sigTermsSql(64)
    val planner = s"""SELECT bits, bands FROM (
        SELECT gb.bits AS bits, gn.bands AS bands,
          gn.bands * ((SELECT count(*) FROM a) + (SELECT count(*) FROM b))
            + gn.bands * pow(0.5, gb.bits)
              * (SELECT count(*) FROM a) * (SELECT count(*) FROM b)
            AS cost
        FROM (SELECT unnest(range(1, 65)) AS bits) gb
        CROSS JOIN (SELECT unnest(range(1, 65)) AS bands) gn
        WHERE gb.bits * gn.bands <= 64
          AND 1 - pow(1 - pow(1 - acos(0.99) / pi(), gb.bits), gn.bands)
                >= 0.95
          AND gn.bands * pow(0.5, gb.bits) * (SELECT count(*) FROM b)
                <= 1024
      ) ORDER BY cost, bands, bits LIMIT 1"""
    // one template for both sides (the bitextBandedCandidates
    // discipline); the 64-plane signature's unused high bits are
    // masked off by the planned (bits, bands) slice, so it equals the
    // Spark side's bits·bands-plane signature on every used bit
    def bandedSide(table: String, idCol: String, vecCol: String) =
      s"""SELECT $idCol, j AS band,
        (sig >> (j * p.bits)) & ((CAST(1 AS BIGINT) << p.bits) - 1)
          AS bucket
      FROM (
        SELECT $idCol, $sig AS sig
        FROM (
          SELECT $idCol,
            list_transform(range(1, len($vecCol) + 1),
              i -> CAST(floor($vecCol[i] * 1e6) AS BIGINT)) AS q,
            list_transform(range(1, len($vecCol) + 1),
              i -> md5_number_upper(CAST(i - 1 AS VARCHAR))) AS h
          FROM $table)
      ) CROSS JOIN ($planner) p
      CROSS JOIN (SELECT unnest(range(64)) AS j)
      WHERE j < p.bands"""
    s"""SELECT c.src_id, a2.va, c.tgt_id, b2.vb
  FROM (
    SELECT DISTINCT ab.src_id, bb.tgt_id
    FROM (
      ${bandedSide("a", "src_id", "va")}
    ) ab
    JOIN (
      ${bandedSide("b", "tgt_id", "vb")}
    ) bb ON ab.band = bb.band AND ab.bucket = bb.bucket
  ) c
  JOIN a a2 USING (src_id)
  JOIN b b2 USING (tgt_id)"""
  }

  /** SQL twin of [[graft.operators.SpanCorrupt.corrupt]]: the per-block
    * md5 draws and slice arithmetic verbatim, with the fold's sentinel
    * counter replayed as a window count of prior masked blocks and the
    * fragment join replayed as an ordered string_agg. */
  private val spanCorruptOracle: String = {
    def h56(salt: String) =
      s"CAST(md5_number_upper('$salt' || CAST(doc_id AS VARCHAR) || ':' " +
        "|| CAST(b AS VARCHAR)) % 72057594037927936 AS BIGINT)"
    val off = s"CAST(${h56("spanO|")} % len(block) AS INT)"
    val len = s"least(CAST(${h56("spanL|")} % 3 AS INT) + 1, " +
      s"len(block) - $off)"
    s"""WITH d AS (
  SELECT doc_id,
    CASE WHEN text IS NULL THEN []
         ELSE list_filter(string_split_regex(trim(text), '\\s+'),
           t -> length(t) > 0) END AS toks
  FROM documents
), nb AS (
  SELECT doc_id, toks,
    greatest(CAST(ceil(len(toks) / 8.0) AS INT), 1) AS nblocks
  FROM d
), blocks AS (
  SELECT doc_id, toks, unnest(range(nblocks)) AS b FROM nb
), calc AS (
  SELECT doc_id, b, toks[b*8 + 1 : b*8 + 8] AS block,
    len(toks[b*8 + 1 : b*8 + 8]) > 0 AND
      ${h56("span|")} % 100 < 40 AS masked
  FROM blocks
), numbered AS (
  SELECT doc_id, b, block, masked,
    CAST(coalesce(sum(CASE WHEN masked THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY b
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT)
      AS k
  FROM calc
), frags AS (
  SELECT doc_id, b, masked,
    CASE WHEN masked THEN
      array_to_string(
        block[1 : $off] ||
        ['<extra_id_' || CAST(k AS VARCHAR) || '>'] ||
        block[$off + $len + 1 : len(block)], ' ')
    ELSE array_to_string(block, ' ') END AS frag,
    CASE WHEN masked THEN
      '<extra_id_' || CAST(k AS VARCHAR) || '> ' ||
      array_to_string(block[$off + 1 : $off + $len], ' ')
    END AS tgt
  FROM numbered
)
SELECT doc_id,
  coalesce(string_agg(frag, ' ' ORDER BY b), '') AS input_text,
  coalesce(string_agg(tgt, ' ' ORDER BY b)
    FILTER (masked), '') AS target_text,
  CAST(coalesce(sum(CASE WHEN masked THEN 1 ELSE 0 END), 0) AS INT)
    AS n_spans
FROM frags GROUP BY doc_id ORDER BY doc_id"""
  }

  /** Shared margin tail of the two bitext oracles (the candidate source
    * CTE is their ONLY difference): quantized cosines on the candidate
    * set → per-side top-4 sums → cross-multiplied integer margin →
    * per-source argmax ≥ 1.15. */
  private def bitextMarginOracle(candidatesSql: String): String =
    s"""WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), a AS (SELECT vec_id AS src_id, v AS va FROM e WHERE vec_id % 2 = 0),
b AS (SELECT vec_id AS tgt_id, v AS vb FROM e WHERE vec_id % 2 = 1),
cand AS (
  $candidatesSql
), sc0 AS (
  SELECT src_id, tgt_id,
    CAST(floor(list_cosine_similarity(va, vb) * 1e6) AS BIGINT) AS cq
  FROM cand
), sc AS (SELECT * FROM sc0 WHERE cq > 0),
ra AS (SELECT *, row_number() OVER (PARTITION BY src_id
    ORDER BY cq DESC, tgt_id) AS r FROM sc),
sa AS (SELECT src_id, sum(cq) AS sa, count(*) AS na
  FROM ra WHERE r <= 4 GROUP BY src_id),
rb AS (SELECT *, row_number() OVER (PARTITION BY tgt_id
    ORDER BY cq DESC, src_id) AS r FROM sc),
sb AS (SELECT tgt_id, sum(cq) AS sb, count(*) AS nb
  FROM rb WHERE r <= 4 GROUP BY tgt_id),
m AS (
  SELECT sc.src_id, sc.tgt_id, sc.cq,
    (sc.cq * 2 * na * nb * 1000000) // (sa * nb + sb * na) AS mq
  FROM sc JOIN sa USING (src_id) JOIN sb USING (tgt_id)
), f AS (
  SELECT *, row_number() OVER (PARTITION BY src_id
    ORDER BY mq DESC, tgt_id) AS rm FROM m
)
SELECT src_id, tgt_id, CAST(cq AS DOUBLE) / 1e6 AS cosine,
  CAST(mq AS DOUBLE) / 1e6 AS margin
FROM f WHERE rm = 1 AND mq >= 1150000
ORDER BY src_id"""

  /** BM25 twin: identical expression tree (same association order, same
    * constant arithmetic) so every double matches bit for bit; per-term
    * contributions are floor-quantized before the per-doc sum, making the
    * score independent of summation order in both engines. */
  private val bm25Oracle: String =
    """WITH base AS (
      |  SELECT doc_id,
      |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
      |      ' ') AS toks
      |  FROM documents
      |), dls AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base
      |), tf AS (
      |  SELECT doc_id, t AS term, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
      |  WHERE t IN ('vector', 'stream', 'window')
      |  GROUP BY doc_id, t
      |), dfs AS (
      |  SELECT term, count(*) AS df FROM tf GROUP BY term
      |), corpus AS (
      |  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM dls
      |), contrib AS (
      |  -- force DOUBLE promotion at the head of every arithmetic chain:
      |  -- bare decimal literals are DECIMAL in DuckDB (exact-decimal
      |  -- products like tf*2.2), which is 1-ulp off Spark's all-double
      |  -- math and could flip a floor boundary
      |  SELECT tf.doc_id,
      |    CAST(floor(
      |      ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0) *
      |        (CAST(tf AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1)) /
      |        (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE) * (1.0 - CAST(0.75 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl /
      |          (CAST(total_dl AS DOUBLE) / n_docs)))
      |      * 1000000) AS BIGINT) AS cq
      |  FROM tf
      |  JOIN dfs USING (term)
      |  JOIN dls USING (doc_id)
      |  CROSS JOIN corpus
      |), scores AS (
      |  SELECT doc_id,
      |    CAST(sum(cq) AS DOUBLE) / 1000000 AS score,
      |    count(*) AS n_terms_hit
      |  FROM contrib GROUP BY doc_id
      |)
      |SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER)
      |    AS rank,
      |  doc_id, n_terms_hit, score
      |FROM scores
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin

  /** Shared core of the q_kn5_logprob / q_ccnet_bands oracles: the full
    * 5-gram KN pipeline up to the per-doc `scored` CTE (the
    * q_kn3_logprob MATERIALIZED discipline, two rungs deeper — every
    * multi-consumer CTE in the g5→g4→g3→g2 chain is materialized). */
  private val kn5OracleCore: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(trim(text)), '\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |), dt AS MATERIALIZED (
      |  SELECT doc_id, p['w1'] AS w1, p['w2'] AS w2, p['w3'] AS w3,
      |    p['w4'] AS w4, p['w5'] AS w5
      |  FROM (
      |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 3),
      |      i -> struct_pack(w1 := tk[i], w2 := tk[i+1], w3 := tk[i+2],
      |        w4 := tk[i+3], w5 := tk[i+4]))) AS p
      |    FROM t WHERE len(tk) >= 5)
      |), g5 AS MATERIALIZED (
      |  SELECT w1, w2, w3, w4, w5, count(*) AS c5
      |  FROM dt GROUP BY w1, w2, w3, w4, w5
      |), g4 AS MATERIALIZED (
      |  SELECT w2, w3, w4, w5, count(*) AS c4
      |  FROM g5 GROUP BY w2, w3, w4, w5
      |), g3 AS MATERIALIZED (
      |  SELECT w3, w4, w5, count(*) AS c3 FROM g4 GROUP BY w3, w4, w5
      |), g2 AS MATERIALIZED (
      |  SELECT w4, w5, count(*) AS c2 FROM g3 GROUP BY w4, w5
      |), ctx5 AS (
      |  SELECT w1, w2, w3, w4, CAST(sum(c5) AS BIGINT) AS tot5,
      |    count(*) AS typ5
      |  FROM g5 GROUP BY w1, w2, w3, w4
      |), ctx4 AS (
      |  SELECT w2, w3, w4, CAST(sum(c4) AS BIGINT) AS tot4,
      |    count(*) AS typ4
      |  FROM g4 GROUP BY w2, w3, w4
      |), ctx3 AS (
      |  SELECT w3, w4, CAST(sum(c3) AS BIGINT) AS tot3,
      |    count(*) AS typ3
      |  FROM g3 GROUP BY w3, w4
      |), ctx2 AS (
      |  SELECT w4, CAST(sum(c2) AS BIGINT) AS tot2, count(*) AS typ2
      |  FROM g2 GROUP BY w4
      |), c1 AS (
      |  SELECT w5, count(*) AS n1p_w FROM g2 GROUP BY w5
      |), ty AS (
      |  SELECT CAST(count(*) AS DOUBLE) AS t_all FROM g2
      |), c AS (
      |  SELECT doc_id,
      |    CAST(floor(ln(
      |      greatest(CAST(c5 AS DOUBLE) - 0.75, 0.0) /
      |        CAST(tot5 AS DOUBLE) +
      |      (0.75 * CAST(typ5 AS DOUBLE) / CAST(tot5 AS DOUBLE)) *
      |        (greatest(CAST(c4 AS DOUBLE) - 0.75, 0.0) /
      |          CAST(tot4 AS DOUBLE) +
      |         (0.75 * CAST(typ4 AS DOUBLE) / CAST(tot4 AS DOUBLE)) *
      |           (greatest(CAST(c3 AS DOUBLE) - 0.75, 0.0) /
      |             CAST(tot3 AS DOUBLE) +
      |            (0.75 * CAST(typ3 AS DOUBLE) / CAST(tot3 AS DOUBLE)) *
      |              (greatest(CAST(c2 AS DOUBLE) - 0.75, 0.0) /
      |                CAST(tot2 AS DOUBLE) +
      |               (0.75 * CAST(typ2 AS DOUBLE) /
      |                 CAST(tot2 AS DOUBLE)) *
      |                 (CAST(n1p_w AS DOUBLE) / t_all))))) * 1000000)
      |      AS BIGINT) AS cq
      |  FROM dt
      |  JOIN g5 USING (w1, w2, w3, w4, w5)
      |  JOIN ctx5 USING (w1, w2, w3, w4)
      |  JOIN g4 USING (w2, w3, w4, w5)
      |  JOIN ctx4 USING (w2, w3, w4)
      |  JOIN g3 USING (w3, w4, w5)
      |  JOIN ctx3 USING (w3, w4)
      |  JOIN g2 USING (w4, w5)
      |  JOIN ctx2 USING (w4)
      |  JOIN c1 USING (w5)
      |  CROSS JOIN ty
      |), scored AS MATERIALIZED (
      |  SELECT doc_id, CAST(sum(cq) AS BIGINT) AS sum_q6,
      |    CAST(count(*) AS BIGINT) AS n_grams,
      |    CAST(sum(cq) AS DOUBLE) / (count(*) * 1000000) AS avg_logprob
      |  FROM c GROUP BY doc_id
      |)""".stripMargin

  /** WordPiece oracle: replays vocabulary training rank-for-rank and
    * the greedy longest-match march as an UNROLLED CTE chain — one
    * (match, advance) step per possible piece boundary; each step
    * consumes ≥ 1 char and words longer than MaxCharsPerWord are [UNK]
    * by rule, so MaxCharsPerWord steps cover every word (the pagerank
    * unrolled-iteration precedent). */
  private def wordpieceOracle: String = {
    val wp = graft.operators.WordPiece
    val steps = (1 to wp.MaxCharsPerWord).map { k =>
      s"""m$k AS MATERIALIZED (
         |  SELECT s.word,
         |    max(CASE WHEN s.pos = 1 THEN length(vp.piece)
         |        ELSE length(vp.piece) - 2 END) AS ml,
         |    max_by(vp.piece,
         |      CASE WHEN s.pos = 1 THEN length(vp.piece)
         |        ELSE length(vp.piece) - 2 END) AS pc
         |  FROM s${k - 1} s JOIN vp
         |    ON (s.pos = 1 AND
         |        substr(s.word, s.pos, length(vp.piece)) = vp.piece)
         |    OR (s.pos > 1 AND length(vp.piece) >= 3 AND
         |        vp.piece LIKE '##%' AND vp.piece =
         |        '##' || substr(s.word, s.pos, length(vp.piece) - 2))
         |  WHERE s.pos <= s.n AND NOT s.unk
         |  GROUP BY s.word
         |), s$k AS MATERIALIZED (
         |  SELECT s.word, s.n,
         |    CASE WHEN s.pos > s.n OR s.unk OR m.ml IS NULL THEN s.pos
         |         ELSE s.pos + m.ml END AS pos,
         |    CASE WHEN s.pos > s.n OR s.unk OR m.ml IS NULL THEN s.acc
         |         ELSE s.acc || ' ' || m.pc END AS acc,
         |    CASE WHEN s.pos > s.n OR s.unk OR m.ml IS NULL THEN s.np
         |         ELSE s.np + 1 END AS np,
         |    s.unk OR (s.pos <= s.n AND m.ml IS NULL) AS unk
         |  FROM s${k - 1} s LEFT JOIN m$k m USING (word)
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH wt AS (
       |  SELECT doc_id, lower(trim(text)) AS t FROM documents
       |), ws AS (
       |  SELECT doc_id, list_filter(string_split_regex(t, '\\s+'),
       |    x -> length(x) > 0) AS l FROM wt
       |), tok AS (
       |  SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
       |    i -> {'wp': i, 'w': l[i]})) AS u FROM ws
       |), tw AS MATERIALIZED (
       |  SELECT doc_id, u.wp AS wp, u.w AS word FROM tok
       |), wc AS (
       |  SELECT word, count(*) AS c FROM tw GROUP BY 1
       |), pcs AS (
       |  SELECT unnest(list_distinct(flatten(
       |    list_transform(range(1, length(word) + 1), p ->
       |      list_transform(
       |        range(1, least(${wp.MaxPieceLen},
       |          length(word) - p + 1) + 1),
       |        l -> CASE WHEN p = 1 THEN word[p:p+l-1]
       |             ELSE '##' || word[p:p+l-1] END))))) AS piece,
       |    c
       |  FROM wc
       |), pwt AS (
       |  SELECT piece, sum(c) AS weight FROM pcs GROUP BY 1
       |), vocab AS (
       |  SELECT piece FROM pwt
       |  WHERE length(regexp_replace(piece, '^##', '')) = 1
       |  UNION ALL
       |  SELECT piece FROM (
       |    SELECT piece,
       |      row_number() OVER (ORDER BY weight DESC, piece) AS rk
       |    FROM pwt WHERE length(regexp_replace(piece, '^##', '')) > 1)
       |  WHERE rk <= 300
       |), vp AS MATERIALIZED (
       |  SELECT piece FROM vocab
       |), dw AS (
       |  SELECT DISTINCT word FROM tw
       |), s0 AS MATERIALIZED (
       |  SELECT word, length(word) AS n, 1 AS pos, '' AS acc, 0 AS np,
       |    length(word) > ${wp.MaxCharsPerWord} AS unk
       |  FROM dw
       |), $steps, enc AS (
       |  SELECT word,
       |    CASE WHEN unk THEN '[UNK]' ELSE trim(acc) END AS ps,
       |    CASE WHEN unk THEN 1 ELSE np END AS np,
       |    CASE WHEN unk THEN 1 ELSE 0 END AS u
       |  FROM s${wp.MaxCharsPerWord}
       |)
       |SELECT tw.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(e.np) AS BIGINT) AS n_pieces,
       |  CAST(sum(e.u) AS BIGINT) AS n_unk_words,
       |  string_agg(e.ps, ' ' ORDER BY tw.wp) AS pieces_text
       |FROM tw JOIN enc e USING (word)
       |GROUP BY tw.doc_id
       |ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_wordpiece" -> wordpieceOracle,

    // replays the novelty computation at the same md5-56 hash grain
    // (collision-exact), with min(doc_id) as the first-seen rule
    "q_gram_novelty" -> (docsWithDupsCte +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS gram
        |  FROM toks WHERE len(t) >= 3
        |), hd AS (
        |  SELECT DISTINCT doc_id,
        |    CAST(md5_number_upper(gram) % 72057594037927936 AS BIGINT)
        |      AS hsh
        |  FROM g
        |), f AS (
        |  SELECT hsh, min(doc_id) AS first_doc FROM hd GROUP BY 1
        |)
        |SELECT hd.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN hd.doc_id = f.first_doc THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN hd.doc_id = f.first_doc THEN 1 ELSE 0 END)
        |    * 1000000 // count(*) AS BIGINT) AS novelty_ppm
        |FROM hd JOIN f USING (hsh)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin),

    // replays the CDC boundary hash from the same premultiplied power
    // table (Cdc.powerTable — emitted as a literal below), rebuilds the
    // chunks, and recomputes the shared-chunk rollup from md5 chunk
    // hashes; chunk_len_sum = length(text) is the structural self-check
    "q_cdc_chunks" -> {
      val pw = graft.operators.Cdc.powerTable.mkString("[", ", ", "]")
      docsWithDupsCte + s""",
        |c AS (
        |  SELECT doc_id, text AS t, length(text) AS n,
        |    list_transform(range(1, length(text) + 1),
        |      p -> ord(text[p:p])) AS cs
        |  FROM docs WHERE length(text) > 0
        |), b AS (
        |  SELECT doc_id, t, n,
        |    list_filter(range(16, n + 1), i ->
        |      list_sum(list_transform(range(0, 16), j ->
        |        cs[i - 15 + j] * ($pw)[j + 1])) % 64 = 0) AS bnd
        |  FROM c
        |), e AS (
        |  SELECT doc_id, t, n,
        |    CASE WHEN len(bnd) > 0 AND bnd[-1] = n THEN bnd
        |         ELSE list_append(bnd, n) END AS ends
        |  FROM b
        |), st AS (
        |  SELECT doc_id, t,
        |    list_prepend(1, list_transform(ends[1:len(ends) - 1],
        |      x -> x + 1)) AS starts,
        |    ends
        |  FROM e
        |), ch AS (
        |  SELECT doc_id, t, unnest(starts) AS s, unnest(ends) AS en
        |  FROM st
        |), h AS (
        |  SELECT doc_id, en - s + 1 AS ln, md5(t[s:en]) AS hsh FROM ch
        |), nd AS (
        |  SELECT hsh, count(DISTINCT doc_id) AS ndocs FROM h GROUP BY 1
        |)
        |SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(ln) AS BIGINT) AS chunk_len_sum,
        |  CAST(sum(CASE WHEN nd.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_shared_chunks
        |FROM h JOIN nd USING (hsh)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // replays the Cavnar–Trenkle classifier end to end: per-doc and
    // per-lang (train split doc_id%5=0) top-20 trigram rank profiles,
    // out-of-place distance with miss penalty 20, argmin by
    // (dist, lang)
    "q_lid_rank" ->
      """WITH nrm AS (
        |  SELECT doc_id, lang, lower(trim(text)) AS t FROM documents
        |  WHERE length(lower(trim(text))) >= 3
        |), tr AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, length(t) - 1),
        |      p -> t[p:p+2])) AS tri
        |  FROM nrm
        |), dc AS (
        |  SELECT doc_id, tri, count(*) AS c FROM tr GROUP BY 1, 2
        |), dp AS (
        |  SELECT doc_id, tri, r_doc FROM (
        |    SELECT doc_id, tri, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY c DESC, tri) AS r_doc FROM dc)
        |  WHERE r_doc <= 20
        |), lc AS (
        |  SELECT lang, tri, count(*) AS c FROM tr
        |  WHERE doc_id % 5 = 0 GROUP BY 1, 2
        |), lp AS (
        |  SELECT lang, tri, r_lang FROM (
        |    SELECT lang, tri, row_number() OVER (PARTITION BY lang
        |      ORDER BY c DESC, tri) AS r_lang FROM lc)
        |  WHERE r_lang <= 20
        |), langs AS (
        |  SELECT DISTINCT lang FROM lp
        |), sc AS (
        |  SELECT dp.doc_id, langs.lang AS cand,
        |    CAST(sum(coalesce(abs(dp.r_doc - lp.r_lang), 20)) AS BIGINT)
        |      AS dist
        |  FROM dp CROSS JOIN langs
        |  LEFT JOIN lp ON lp.lang = langs.lang AND lp.tri = dp.tri
        |  GROUP BY 1, 2
        |)
        |SELECT doc_id, cand AS pred_lang, dist FROM (
        |  SELECT doc_id, cand, dist, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY dist, cand) AS rk FROM sc)
        |WHERE rk = 1 ORDER BY doc_id""".stripMargin,

    "q_mixture" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 1000000
        |    AS DOUBLE) / 1e6 <
        |  CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
        |    WHEN 'src2' THEN 0.25 WHEN 'src3' THEN 0.1
        |    WHEN 'src4' THEN 0.75 ELSE 0.0 END
        |ORDER BY doc_id""".stripMargin,
    "q_bm25" -> bm25Oracle,
    "q_simhash_pairs" -> simhashOracle,
    "q_ann_lsh" -> annLshOracle,
    "q_lang_quality" -> langQualityOracle,
    "q_curation_funnel" -> curationOracle,

    // same decorated composition as the Spark side (chr codepoints:
    // 769 = U+0301 combining acute, 8491 = U+212B Angstrom sign,
    // 776 = U+0308 combining diaeresis, 64257 = U+FB01 fi ligature)
    "q_nfc_normalize" ->
      """WITH deco AS (
        |  SELECT doc_id,
        |    'Cafe' || chr(769) || ' ' || chr(8491) || ' nai' || chr(776)
        |      || 've ' || chr(64257) || 'ne ' || substr(text, 1, 40)
        |      AS deco
        |  FROM documents
        |)
        |SELECT doc_id, nfc_normalize(deco) AS nfc_text,
        |  CAST(length(deco) AS BIGINT) AS pre_len,
        |  CAST(length(nfc_normalize(deco)) AS BIGINT) AS post_len
        |FROM deco ORDER BY doc_id""".stripMargin,

    // closed-form twin of Multimodal.syntheticSpec: what the real ImageIO
    // decode must recover from each generated solid-color PNG
    "q_multimodal_features" ->
      """SELECT doc_id AS media_id, true AS decode_ok,
        |  doc_id % 64 + 32 AS width,
        |  doc_id % 48 + 24 AS height,
        |  (doc_id * 7) % 256 AS r,
        |  (doc_id * 13) % 256 AS g,
        |  (doc_id * 29) % 256 AS b
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_minhash_pairs" -> (docsWithDupsCte +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
        |  FROM toks WHERE len(t) >= 3
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  floor(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        |    * 1e6) / 1e6 AS jaccard
        |FROM g a JOIN g b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |  (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin),
    "q_tfidf_keywords" ->
      """WITH tk AS (
        |  SELECT doc_id,
        |    unnest(string_split(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'), ' ')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tk GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), nd AS (
        |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf
        |), sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    CAST(tf.tf * CAST(floor(ln(
        |      CAST((SELECT n FROM nd) AS DOUBLE) / df.df) * 1000000)
        |      AS BIGINT) AS BIGINT) AS score_q6
        |  FROM tf JOIN df USING (term)
        |)
        |SELECT doc_id, rk, term, score_q6 FROM (
        |  SELECT doc_id, term, score_q6,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score_q6 DESC, term) AS rk
        |  FROM sc)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // centroid scaled by n (xq·n − Σxq) keeps every aggregate an exact
    // integer sum — the only float ops are the final sqrt/division of
    // identical values
    "q_embed_cohesion" ->
      """WITH q AS (
        |  SELECT vec_id, label,
        |    unnest(range(1, len(embedding) + 1)) AS dim,
        |    unnest(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
        |      AS xq
        |  FROM embeddings
        |), cent AS (
        |  SELECT label, dim, CAST(sum(xq) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM q GROUP BY label, dim
        |)
        |SELECT q.vec_id, q.label,
        |  CAST(sum((q.xq * c.n - c.s) * (q.xq * c.n - c.s)) AS BIGINT)
        |    AS dist2_scaled,
        |  round(sqrt(CAST(sum((q.xq * c.n - c.s) * (q.xq * c.n - c.s))
        |    AS DOUBLE)) / (max(c.n) * 10000), 6) AS dist
        |FROM q JOIN cent c ON q.label = c.label AND q.dim = c.dim
        |GROUP BY q.vec_id, q.label ORDER BY q.vec_id""".stripMargin,

    // replays every sign bit (md5_number_upper % 2^56 % 2 == the
    // driver-side md5Long56Local) and sums the same quantized integers
    "q_jl_reduce" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    unnest(range(0, len(embedding))) AS i,
        |    unnest(list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
        |      AS xq
        |  FROM embeddings
        |), s AS (
        |  SELECT i.range AS i, j.range AS j,
        |    CASE WHEN CAST(md5_number_upper(
        |        'jl|' || CAST(i.range AS VARCHAR) || '|'
        |          || CAST(j.range AS VARCHAR))
        |        % 72057594037927936 AS BIGINT) % 2 = 0
        |      THEN 1 ELSE -1 END AS sgn
        |  FROM range(0, 64) i, range(0, 16) j
        |)
        |SELECT q.vec_id, CAST(s.j AS INTEGER) AS out_dim,
        |  CAST(sum(q.xq * s.sgn) AS BIGINT) AS comp_q6,
        |  CAST(sum(q.xq * s.sgn) AS DOUBLE)
        |    / (1000000 * sqrt(16)) AS value
        |FROM q JOIN s ON q.i = s.i
        |GROUP BY q.vec_id, s.j
        |ORDER BY vec_id, out_dim""".stripMargin,

    // same truth-pair edges as q_pagerank; a<b<c wedge closure,
    // per-node counts off the 3-way union, integer ppm clustering
    "q_triangles" -> (docsWithDupsCte + trigramPairsCte +
      """, ce AS (
        |  SELECT DISTINCT least(id_a, id_b) AS u,
        |    greatest(id_a, id_b) AS v
        |  FROM pairs WHERE id_a <> id_b
        |), tri AS (
        |  SELECT ab.u AS a, ab.v AS b, bc.v AS c
        |  FROM ce ab
        |  JOIN ce bc ON ab.v = bc.u
        |  JOIN ce ac ON ab.u = ac.u AND bc.v = ac.v
        |), tn AS (
        |  SELECT node, count(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri
        |    UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY 1
        |), dg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM ce UNION ALL SELECT v FROM ce)
        |  GROUP BY 1
        |)
        |SELECT dg.node AS doc_id, CAST(dg.deg AS BIGINT) AS deg,
        |  CAST(coalesce(tn.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(CASE WHEN dg.deg >= 2 THEN
        |    coalesce(tn.n_tri, 0) * 2 * 1000000 // (dg.deg * (dg.deg - 1))
        |    ELSE 0 END AS BIGINT) AS clustering_ppm
        |FROM dg LEFT JOIN tn USING (node)
        |ORDER BY doc_id""".stripMargin),

    // same truth-pair edges; replays all four deterministic LPA rounds
    // (most-frequent neighbor label, ties to min) via lpCtes
    "q_label_prop" -> (docsWithDupsCte + trigramPairsCte +
      """, e0 AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |)""".stripMargin + lpCtes(4) + """
        |SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community
        |FROM lp4 ORDER BY doc_id""".stripMargin),

    // rebuilds the edge set from the all-pairs trigram truth (the
    // q_minhash_pairs pinned property), then replays pageRankNanos'
    // integer recurrence with all five iterations unrolled — every op
    // is integer division/multiplication, so the replay is exact
    "q_pagerank" -> (docsWithDupsCte + trigramPairsCte +
      """, e0 AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |)""".stripMargin +
      pageRankCtes("e0") +
      """
        |SELECT node AS doc_id, deg, pr AS pr_nanos
        |FROM it5 ORDER BY doc_id""".stripMargin),

    // components from the same truth pairs (the q_dedup_clusters
    // recursive CTE) + the unrolled PageRank replay + a per-component
    // argmax — the full canonical-pick composition in one statement
    "q_dedup_canonical" -> (docsWithDupsCte
      .replace("WITH docs AS (", "WITH RECURSIVE docs AS (") +
      trigramPairsCte +
      """, sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs
        |), reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM docs
        |  UNION
        |  SELECT s.dst, r.label FROM reach r JOIN sym s ON r.id = s.src
        |), comp AS (
        |  SELECT id, min(label) AS component FROM reach GROUP BY id
        |)""".stripMargin +
      pageRankCtes("sym") +
      """, sel AS (
        |  SELECT c.component, c.id, p.pr,
        |    row_number() OVER (PARTITION BY c.component
        |      ORDER BY p.pr DESC, c.id) AS rk,
        |    count(*) OVER (PARTITION BY c.component) AS n_members
        |  FROM comp c JOIN it5 p ON c.id = p.node
        |)
        |SELECT component, CAST(n_members AS BIGINT) AS n_members,
        |  id AS canonical_id, pr AS canonical_pr_nanos
        |FROM sel WHERE rk = 1 AND n_members > 1
        |ORDER BY component""".stripMargin),

    "q_chunk_stride" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, n_tokens, toks,
        |    unnest(range(0, CAST(ceil(greatest(n_tokens - 64, 0) / 32.0)
        |      AS BIGINT) + 1)) AS chunk_idx
        |  FROM t WHERE n_tokens > 0
        |)
        |SELECT doc_id, chunk_idx,
        |  chunk_idx * 32 AS start_tok,
        |  least(64, n_tokens - chunk_idx * 32) AS chunk_tokens,
        |  toks[CAST(chunk_idx * 32 + 1 AS BIGINT)] AS first_token
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // counts by word TEXT where the engine counts by xxhash64 key —
    // the gate proves the hashed grouping lossless (collision
    // discipline); ln() of identical integer-valued doubles floors
    // identically on both engines (unigramLogProb discipline)
    "q_token_entropy" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0)) AS w
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, w, count(*) AS c FROM tk GROUP BY doc_id, w
        |)
        |SELECT doc_id,
        |  CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
        |    AS BIGINT)) AS BIGINT) AS sum_clnc_q6,
        |  round(ln(CAST(sum(c) AS DOUBLE))
        |    - CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
        |        AS BIGINT)) AS DOUBLE)
        |      / (sum(c) * 1000000), 6) AS entropy
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_vocab_coverage" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    t -> len(t) > 0)) AS w
        |  FROM documents
        |), top AS (
        |  SELECT w FROM (
        |    SELECT w, count(*) AS n FROM tk GROUP BY w
        |    ORDER BY n DESC, w LIMIT 100)
        |)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  round(CAST(sum(CASE WHEN top.w IS NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*), 6) AS oov_rate
        |FROM tk LEFT JOIN top ON tk.w = top.w
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_doc_stats" ->
      ("""SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |  END AS n_tokens_ws,
        |  CAST(len(regexp_extract_all(text, '\w{1,4}|[^\w\s]')) AS BIGINT)
        |    AS n_tokens_bpeish,
        |  CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> x IN (""" + graft.functions.TextFunctions.enStopwords
          .map(w => s"'$w'").mkString(",") + """))) AS BIGINT) AS stop_hits,
        |  round(CASE WHEN length(text) = 0 THEN 0.0
        |    ELSE CAST(length(regexp_replace(text, '[^!-/:-@\[-`{-~]', '', 'g'))
        |      AS DOUBLE) / length(text) END, 6) AS punct_ratio
        |FROM documents ORDER BY doc_id""").stripMargin,

    "q_dedup_exact" -> (docsWithDupsCte +
      """
        |SELECT min(doc_id) AS canonical_id, count(*) AS n_dups
        |FROM docs
        |GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
        |HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin),

    "q_jaccard_pairs" -> (docsWithDupsCte +
      """, g AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(
        |      range(1, length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) - 3),
        |      i -> regexp_replace(lower(trim(text)), '\s+', ' ', 'g')[i:i+4]
        |    )) AS grams
        |  FROM docs
        |  WHERE length(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) >= 5
        |)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))), 6)
        |    AS jaccard
        |FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |  (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams))) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin),

    // same injected URLs, same RE2∩Java patterns, same last-two-label
    // domain rule — byte-for-byte replay of the Spark expressions
    "q_url_filter" ->
      """WITH d AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' see http://sub' ||
        |      CAST(doc_id % 5 AS VARCHAR) || '.site' ||
        |      CAST(doc_id % 7 AS VARCHAR) || '.example/p' ||
        |      CAST(doc_id AS VARCHAR) ELSE '' END ||
        |    CASE WHEN doc_id % 9 = 0 THEN ' http://ads.example/x' ||
        |      CAST(doc_id AS VARCHAR) ELSE '' END AS text
        |  FROM documents
        |), u AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+(/[^ \t\n]*)?')
        |      AS urls
        |  FROM d
        |), dom AS (
        |  SELECT doc_id, urls,
        |    list_transform(urls, x -> array_to_string(
        |      string_split(regexp_extract(x, 'https?://([A-Za-z0-9.-]+)', 1),
        |        '.')[greatest(len(string_split(
        |          regexp_extract(x, 'https?://([A-Za-z0-9.-]+)', 1),
        |          '.')) - 1, 1):], '.')) AS doms
        |  FROM u
        |)
        |SELECT doc_id, CAST(len(urls) AS BIGINT) AS n_urls,
        |  CASE WHEN len(urls) > 0 THEN doms[1] ELSE '' END AS first_domain,
        |  list_has_any(doms, ['ads.example']) AS blocked
        |FROM dom ORDER BY doc_id""".stripMargin,

    // identical variant derivation + a full canonicalization replay:
    // scheme/host lowering, www. strip, default-port drop, fragment
    // strip, tracking-param filter, param sort
    "q_url_canonical" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'HTTPS://WWW.site' || CAST(doc_id % 7 AS VARCHAR) ||
        |    '.example.com' ||
        |    CASE WHEN doc_id % 3 = 0 THEN ':443'
        |         WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END ||
        |    '/p/' || CAST(doc_id % 50 AS VARCHAR) ||
        |    CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&b=2&a=1&gclid=x'
        |         WHEN doc_id % 10 = 7 THEN ''
        |         ELSE '?a=1&b=2' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN '#frag'
        |         WHEN doc_id % 10 = 7 THEN '#sec?x=1'
        |         ELSE '' END AS url
        |  FROM documents
        |), parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
        |      AS scheme,
        |    lower(regexp_extract(url, '^[^:/?#]+://([^/?#]+)', 1))
        |      AS hostport,
        |    regexp_extract(url, '^[^:/?#]+://[^/?#]*([^?#]*)', 1) AS path0,
        |    regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS query
        |  FROM u
        |), norm AS (
        |  SELECT doc_id, scheme,
        |    regexp_replace(regexp_extract(hostport, '^([^:]*)', 1),
        |      '^www\.', '') AS host,
        |    regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |    CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        |    list_sort(list_filter(string_split(query, '&'),
        |      p -> p != ''
        |        AND NOT starts_with(lower(split_part(p, '=', 1)), 'utm_')
        |        AND lower(split_part(p, '=', 1)) NOT IN ('gclid', 'fbclid',
        |          'msclkid', 'mc_cid', 'mc_eid', 'igshid', 'ref',
        |          'ref_src'))) AS params
        |  FROM parts
        |), canon AS (
        |  SELECT scheme || '://' || host ||
        |    CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |         OR (scheme = 'https' AND port = '443') THEN ''
        |         ELSE ':' || port END ||
        |    path ||
        |    CASE WHEN len(params) = 0 THEN ''
        |         ELSE '?' || array_to_string(params, '&') END
        |      AS canonical_url
        |  FROM norm
        |)
        |SELECT canonical_url, count(*) AS n
        |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin,

    // all-pairs cosine truth → symmetric edges → recursive reach → min
    // label per component (the q_dedup_clusters pattern on embeddings)
    "q_embed_dedup" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 = 0
        |), pairs AS (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.99
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL
        |  SELECT id_b AS src, id_a AS dst FROM pairs
        |), reach(id, label) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT s.dst, r.label FROM reach r JOIN sym s ON r.id = s.src
        |), comp AS (
        |  SELECT id, min(label) AS component FROM reach GROUP BY id
        |)
        |SELECT component AS canonical_id, count(*) AS n_members
        |FROM comp GROUP BY component HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,

    "q_embed_dup_pairs" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 = 0
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.99
        |ORDER BY id_a, id_b""".stripMargin,

    "q_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, source, n_chars,
        |    ln((CAST(md5_number_upper('ws|' || CAST(doc_id AS VARCHAR))
        |        % 72057594037927936 AS BIGINT) + 1)
        |      / 72057594037927936.0)
        |    / greatest(CAST(n_chars AS DOUBLE), 1e-9) AS key
        |  FROM documents
        |)
        |SELECT source, doc_id, n_chars FROM (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY key DESC, doc_id) AS rk
        |  FROM k)
        |WHERE rk <= 20
        |ORDER BY source, doc_id""".stripMargin,

    "q_split_leakage" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE vec_id % 20 = 0
        |), sp AS (
        |  SELECT vec_id,
        |    CASE WHEN substr(sha256('split|' || CAST(vec_id AS VARCHAR)), 1, 2)
        |           < 'cc' THEN 'train'
        |         WHEN substr(sha256('split|' || CAST(vec_id AS VARCHAR)), 1, 2)
        |           < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM e
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  sa.split AS split_a, sb.split AS split_b,
        |  round(list_cosine_similarity(a.v, b.v), 4) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |JOIN sp sa ON sa.vec_id = a.vec_id
        |JOIN sp sb ON sb.vec_id = b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.99
        |  AND sa.split <> sb.split
        |ORDER BY id_a, id_b""".stripMargin,

    "q_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    END AS tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, text, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT source,
        |  CAST(floor((cum - tokens) / 2048.0) AS BIGINT) AS shard_id,
        |  count(*) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS total_tokens,
        |  md5(string_agg(text, chr(10) || '<|doc|>' || chr(10)
        |    ORDER BY doc_id)) AS packed_md5
        |FROM c
        |GROUP BY source, CAST(floor((cum - tokens) / 2048.0) AS BIGINT)
        |ORDER BY source, shard_id""".stripMargin,

    "q_pack_shards" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    END AS tokens
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t
        |)
        |SELECT doc_id, source, tokens,
        |  CAST(floor((cum - tokens) / 2048.0) AS BIGINT) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_hash_split" ->
      """SELECT source,
        |  CASE WHEN substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
        |         THEN 'train'
        |       WHEN substr(sha256('split|' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin,

    "q_dedup_clusters" -> (docsWithDupsCte
      .replace("WITH docs AS (", "WITH RECURSIVE docs AS (") +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), g AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
        |  FROM toks WHERE len(t) >= 3
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM g a JOIN g b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        |    (len(a.grams) + len(b.grams) - len(list_intersect(a.grams, b.grams)))
        |    >= 0.5
        |), sym AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL
        |  SELECT id_b AS src, id_a AS dst FROM pairs
        |), reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM docs
        |  UNION
        |  SELECT s.dst, r.label FROM reach r JOIN sym s ON r.id = s.src
        |), comp AS (
        |  SELECT id, min(label) AS component FROM reach GROUP BY id
        |)
        |SELECT component AS canonical_id, count(*) AS n_members
        |FROM comp GROUP BY component HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin),

    "q_pii" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text ||
        |      ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or ' ||
        |      '10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 ' ||
        |      '555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
        |    ELSE text END AS text
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(text,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT)
        |    AS n_ips,
        |  CAST(len(regexp_extract_all(
        |    regexp_replace(
        |      regexp_replace(text,
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |        '<EMAIL>', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
        |      '<IP>', 'g'),
        |    '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
        |  CAST(length(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(text,
        |          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |          '<EMAIL>', 'g'),
        |        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}',
        |        '<IP>', 'g'),
        |      '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'))
        |    AS BIGINT) AS redacted_len
        |FROM d ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' ' || text
        |         ELSE text END AS text
        |  FROM documents
        |), t AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS tk
        |  FROM d
        |), g AS (
        |  SELECT doc_id,
        |    greatest(len(tk) - 2, 0) AS total,
        |    len(list_distinct(list_transform(range(1, len(tk) - 1),
        |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS n_distinct
        |  FROM t
        |)
        |SELECT doc_id,
        |  CASE WHEN total <= 0 THEN 0.0
        |       ELSE floor(CAST(total - n_distinct AS DOUBLE) / total * 1e6)
        |         / 1e6 END AS rep_ratio,
        |  CASE WHEN total <= 0 THEN false
        |       ELSE CAST(total - n_distinct AS DOUBLE) / total > 0.2
        |       END AS flagged
        |FROM g ORDER BY doc_id""".stripMargin,

    // replays the Gopher kernel's line/gram group-counting with per-doc
    // unnest + GROUP BY; every fraction is exact-integer arithmetic
    // widened once to double, so the floor-quantized values match
    // bit-for-bit (the q_repetition convention)
    "q_gopher_repetition" ->
      """WITH lined AS (
        |  SELECT doc_id, replace(text, ' the ', chr(10)) AS text
        |  FROM documents
        |), lines AS (
        |  SELECT doc_id, trim(l) AS line FROM (
        |    SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        |    FROM lined)
        |  WHERE length(trim(l)) > 0
        |), lg AS (
        |  SELECT doc_id, line, count(*) AS c
        |  FROM lines GROUP BY doc_id, line
        |), lstat AS (
        |  SELECT doc_id,
        |    CAST(sum(c) - count(*) AS DOUBLE) /
        |      CAST(sum(c) AS BIGINT) AS dlf,
        |    CASE WHEN sum(c * length(line)) > 0 THEN
        |      CAST(sum((c - 1) * length(line)) AS DOUBLE) /
        |        CAST(sum(c * length(line)) AS BIGINT)
        |      ELSE 0.0 END AS dlcf
        |  FROM lg GROUP BY doc_id
        |), w AS (
        |  SELECT doc_id, string_split(nt, ' ') AS t,
        |    length(nt) AS total_chars
        |  FROM (SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
        |    FROM lined)
        |), g2c AS (
        |  SELECT doc_id, total_chars, gram, count(*) AS c FROM (
        |    SELECT doc_id, total_chars,
        |      unnest(list_transform(range(1, len(t)),
        |        i -> t[i] || ' ' || t[i+1])) AS gram
        |    FROM w WHERE len(t) >= 2)
        |  GROUP BY doc_id, total_chars, gram
        |), top2 AS (
        |  SELECT doc_id,
        |    CAST(c * length(gram) AS DOUBLE) / total_chars AS tf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY c DESC, gram) AS rn
        |  FROM g2c
        |), g5c AS (
        |  SELECT doc_id, gram, count(*) AS c FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(t) - 3),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
        |          || t[i+3] || ' ' || t[i+4])) AS gram
        |    FROM w WHERE len(t) >= 5)
        |  GROUP BY doc_id, gram
        |), dup5 AS (
        |  SELECT doc_id,
        |    CASE WHEN sum(c * length(gram)) > 0 THEN
        |      CAST(sum(CASE WHEN c >= 2 THEN c * length(gram)
        |        ELSE 0 END) AS DOUBLE) /
        |        CAST(sum(c * length(gram)) AS BIGINT)
        |      ELSE 0.0 END AS df
        |  FROM g5c GROUP BY doc_id
        |)
        |SELECT l.doc_id,
        |  floor(coalesce(s.dlf, 0.0) * 1e6) / 1e6 AS dup_line_frac,
        |  floor(coalesce(s.dlcf, 0.0) * 1e6) / 1e6 AS dup_line_char_frac,
        |  floor(coalesce(t2.tf, 0.0) * 1e6) / 1e6 AS top_2gram_char_frac,
        |  floor(coalesce(d5.df, 0.0) * 1e6) / 1e6 AS dup_5gram_char_frac
        |FROM lined l
        |LEFT JOIN lstat s USING (doc_id)
        |LEFT JOIN (SELECT doc_id, tf FROM top2 WHERE rn = 1) t2
        |  USING (doc_id)
        |LEFT JOIN dup5 d5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_chunk_docs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |    END AS n_tokens
        |  FROM documents
        |)
        |SELECT doc_id,
        |  unnest(range(CAST(ceil(n_tokens / 64.0) AS BIGINT))) AS chunk_idx,
        |  least(64, n_tokens -
        |    unnest(range(CAST(ceil(n_tokens / 64.0) AS BIGINT))) * 64)
        |    AS chunk_tokens,
        |  toks[CAST(unnest(range(CAST(ceil(n_tokens / 64.0) AS BIGINT))) * 64
        |    + 1 AS BIGINT)] AS first_token
        |FROM t WHERE n_tokens > 0
        |ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM documents
        |), g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
        |  FROM toks WHERE len(t) >= 3
        |), bg AS (
        |  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
        |), cg AS (
        |  SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 != 0
        |)
        |SELECT cg.doc_id, count(DISTINCT cg.gram) AS n_overlap
        |FROM cg JOIN bg USING (gram)
        |GROUP BY cg.doc_id HAVING count(DISTINCT cg.gram) >= 2
        |ORDER BY doc_id""".stripMargin,

    // GENERATED from the same replacement tables as the implementation
    // (TextFunctions.webCleanSql) — regexes, entity order, and mojibake
    // digraphs are byte-identical by construction
    "q_web_clean" -> {
      val raw = "'" + webDirtyPrefix.replace("'", "''") + "' || text"
      s"""SELECT doc_id, ${TextFunctions.webCleanSql(raw)} AS clean
         |FROM documents WHERE doc_id % 9 = 0
         |ORDER BY doc_id""".stripMargin
    },

    // bipartite all-pairs trigram-Jaccard truth over the train/benchmark
    // split — the q_minhash_pairs recall convention, cross-corpus
    "q_decontaminate_neardup" ->
      """WITH bench AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0
        |), train AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0
        |  UNION ALL
        |  SELECT doc_id + 300000, text || ' graft extra tail' FROM bench
        |), tg AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
        |  FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ') AS t FROM train) WHERE len(t) >= 3
        |), bg AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS grams
        |  FROM (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),
        |    '\s+', ' ', 'g'), ' ') AS t FROM bench) WHERE len(t) >= 3
        |)
        |SELECT t.doc_id, b.doc_id AS ref_id,
        |  floor(CAST(len(list_intersect(t.grams, b.grams)) AS DOUBLE) /
        |    (len(t.grams) + len(b.grams) - len(list_intersect(t.grams, b.grams)))
        |    * 1e6) / 1e6 AS jaccard
        |FROM tg t JOIN bg b ON true
        |WHERE CAST(len(list_intersect(t.grams, b.grams)) AS DOUBLE) /
        |  (len(t.grams) + len(b.grams) - len(list_intersect(t.grams, b.grams)))
        |  >= 0.5
        |ORDER BY 1, 2""".stripMargin,

    // all-pairs trigram truth between the WHOLE corpus (build half +
    // append half) and the derived crawl batch — banding recall
    // completeness at 0.5 is the q_minhash_pairs pinned property, and
    // Jaccard over murmur-hashed distinct grams equals Jaccard over
    // the grams themselves
    "q_dedup_index_probe" -> dedupIndexProbeOracle,

    // the keyed (backfill) plan computes the SAME pairs from the same
    // index — one truth, two physical dataflows
    "q_dedup_index_backfill" -> dedupIndexProbeOracle,
    // migration is metadata-only, so the migrated+appended index must
    // serve the identical pair set: same all-pairs trigram truth
    "q_dedup_index_migrate" -> dedupIndexProbeOracle,
    "q_dedup_index_compact" -> dedupIndexProbeOracle,
    // tiered maintenance is pure data movement over the same corpus —
    // the probe truth is the identical all-pairs oracle
    "q_dedup_index_compact_tiered" -> dedupIndexProbeOracle,

    // same integer difficulty (prefScoreSql), same fixed-threshold
    // banding (integer //, both operands non-negative), same
    // per-(band, source) rank window
    "q_curriculum" ->
      ("""WITH scored AS (
        |  SELECT doc_id, source,
        |    """ + graft.functions.TextFunctions.prefScoreSql("text") +
        """ AS difficulty
        |  FROM documents WHERE text IS NOT NULL
        |), banded AS (
        |  SELECT doc_id, source, difficulty,
        |    least(greatest(difficulty, 0) // 2000, 3) AS band
        |  FROM scored
        |)
        |SELECT doc_id, source, difficulty,
        |  CAST(band AS BIGINT) AS band,
        |  CAST(row_number() OVER (PARTITION BY band, source
        |    ORDER BY greatest(difficulty, 0), doc_id) AS BIGINT)
        |    AS interleave_rank
        |FROM banded
        |ORDER BY band, interleave_rank, source, doc_id""").stripMargin,

    // one GROUP BY on the quasi-identifier tuple; count(DISTINCT)
    // ignores NULL sensitive values on both engines
    "q_kanon" ->
      """SELECT lang, source, n_chars // 500 AS len_band,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT text) AS BIGINT) AS l_div,
        |  (count(*) >= 5 AND count(DISTINCT text) >= 2) AS kept
        |FROM documents
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    // the row-level window-count twin; suppressed rows keep their
    // doc_id but lose every QI cell
    "q_kanon_rows" ->
      """WITH qi AS (
        |  SELECT doc_id, lang, source, n_chars // 500 AS len_band,
        |    count(*) OVER (PARTITION BY lang, source, n_chars // 500)
        |      < 5 AS suppressed
        |  FROM documents
        |)
        |SELECT doc_id,
        |  CASE WHEN suppressed THEN NULL ELSE lang END AS lang,
        |  CASE WHEN suppressed THEN NULL ELSE source END AS source,
        |  CASE WHEN suppressed THEN NULL ELSE len_band END AS len_band,
        |  suppressed
        |FROM qi ORDER BY doc_id""".stripMargin,

    // replays the md5Long56 bucket hash, the add-one smoothing, and the
    // once-quantized per-bucket log ratio; per-doc sums are integer
    // sums, so they commute on both engines
    "q_dsir" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS t
        |  FROM documents
        |), ttk AS (
        |  SELECT list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS t
        |  FROM documents WHERE source IN ('src0', 'src1')
        |), rb AS (
        |  SELECT doc_id,
        |    CAST(md5_number_upper(gram) % 72057594037927936 AS BIGINT)
        |      % 4096 AS bucket
        |  FROM (SELECT doc_id, unnest(t || CASE WHEN len(t) >= 2 THEN
        |      list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |      ELSE CAST([] AS VARCHAR[]) END) AS gram
        |    FROM tk)
        |), tb AS (
        |  SELECT
        |    CAST(md5_number_upper(gram) % 72057594037927936 AS BIGINT)
        |      % 4096 AS bucket
        |  FROM (SELECT unnest(t || CASE WHEN len(t) >= 2 THEN
        |      list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
        |      ELSE CAST([] AS VARCHAR[]) END) AS gram
        |    FROM ttk)
        |), rc AS (
        |  SELECT bucket, count(*) AS rcnt FROM rb GROUP BY bucket
        |), tcn AS (
        |  SELECT bucket, count(*) AS tcnt FROM tb GROUP BY bucket
        |), tot AS (
        |  SELECT (SELECT CAST(sum(rcnt) AS BIGINT) FROM rc) AS rt,
        |    (SELECT CAST(sum(tcnt) AS BIGINT) FROM tcn) AS tt
        |), ratio AS (
        |  SELECT rc.bucket,
        |    CAST(floor((ln((CAST(coalesce(tcn.tcnt, 0) AS DOUBLE) + 1.0) /
        |        (CAST(tt AS DOUBLE) + 4096.0)) -
        |      ln((CAST(rc.rcnt AS DOUBLE) + 1.0) /
        |        (CAST(rt AS DOUBLE) + 4096.0))) * 1000000)
        |      AS BIGINT) AS lr
        |  FROM rc LEFT JOIN tcn USING (bucket) CROSS JOIN tot
        |)
        |SELECT rb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
        |  CAST(sum(r.lr) AS BIGINT) AS weight_q6,
        |  CAST(sum(r.lr) AS DOUBLE) / (count(*) * 1000000) AS avg_logratio
        |FROM rb JOIN ratio r USING (bucket)
        |GROUP BY rb.doc_id ORDER BY rb.doc_id""".stripMargin,

    // groups by the gram TEXT itself (the Spark plan ships 8-byte xxhash64
    // keys) — agreement proves the hashed plan loses nothing (identical up
    // to xxhash64 collisions, ~n²/2⁶⁴)
    "q_ngram_span_dedup" -> (docsWithDupsCte +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 6),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |        || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' '
        |        || t[i+7]))) AS gram
        |  FROM toks WHERE len(t) >= 8
        |), shared AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
        |)
        |SELECT doc_id, count(*) AS n_dup_grams
        |FROM g JOIN shared USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin),

    // groups by gram TEXT where the engine joins 8-byte hashes — the
    // gate proves the hashed pair formation lossless
    "q_containment" -> (docsWithDupsCte +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), g AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_transform(range(1, len(t) - 6),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
        |        || ' ' || t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' '
        |        || t[i+7]))) AS gram
        |  FROM toks WHERE len(t) >= 8
        |), sizes AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS grams_a
        |  FROM g GROUP BY doc_id
        |), joinable AS (
        |  SELECT gram FROM g GROUP BY gram
        |  HAVING count(*) >= 2 AND count(*) <= 100
        |), capped AS (
        |  SELECT doc_id, gram FROM g JOIN joinable USING (gram)
        |), pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM capped a JOIN capped b ON a.gram = b.gram
        |    AND a.doc_id <> b.doc_id
        |  GROUP BY a.doc_id, b.doc_id
        |  HAVING count(*) >= 8
        |)
        |SELECT p.id_a, p.id_b, p.shared, s.grams_a,
        |  CAST(p.shared AS DOUBLE) / s.grams_a AS containment
        |FROM pairs p JOIN sizes s ON s.doc_id = p.id_a
        |ORDER BY id_a, id_b""".stripMargin),

    // positions replay over the gram text (lossless-hash proof, the
    // q_ngram_span_dedup discipline); DuckDB's 1-based list positions
    // shift to Spark's 0-based token indices at the final select
    "q_exact_substr" -> (docsWithDupsCte +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), pos AS (
        |  SELECT doc_id, unnest(range(1, len(t) - 6)) AS p, t
        |  FROM toks WHERE len(t) >= 8
        |), g AS (
        |  SELECT doc_id, p,
        |    t[p] || ' ' || t[p+1] || ' ' || t[p+2] || ' ' || t[p+3]
        |      || ' ' || t[p+4] || ' ' || t[p+5] || ' ' || t[p+6] || ' '
        |      || t[p+7] AS gram
        |  FROM pos
        |), dup AS (
        |  SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2
        |), d AS (
        |  SELECT doc_id, p FROM g JOIN dup USING (gram)
        |), brk AS (
        |  SELECT doc_id, p, CASE WHEN p > lag(p) OVER
        |      (PARTITION BY doc_id ORDER BY p) + 8 THEN 1 ELSE 0 END AS b
        |  FROM d
        |), isl AS (
        |  SELECT doc_id, p, sum(b) OVER (PARTITION BY doc_id ORDER BY p
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM brk
        |)
        |SELECT doc_id, CAST(min(p) - 1 AS INT) AS span_start,
        |  CAST(max(p) - 1 + 8 AS INT) AS span_end
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin),

    // keep-one twin: the chain argmin is replayed as row_number over the
    // gram TEXT ordered by (doc_id, p) — rn 1 is the canonical survivor,
    // rn >= 2 in a >= 2-occurrence chain is duplicated
    "q_exact_substr_keep" -> (docsWithDupsCte +
      """, toks AS (
        |  SELECT doc_id,
        |    string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
        |      ' ') AS t
        |  FROM docs
        |), pos AS (
        |  SELECT doc_id, unnest(range(1, len(t) - 6)) AS p, t
        |  FROM toks WHERE len(t) >= 8
        |), g AS (
        |  SELECT doc_id, p,
        |    t[p] || ' ' || t[p+1] || ' ' || t[p+2] || ' ' || t[p+3]
        |      || ' ' || t[p+4] || ' ' || t[p+5] || ' ' || t[p+6] || ' '
        |      || t[p+7] AS gram
        |  FROM pos
        |), d AS (
        |  SELECT doc_id, p FROM (
        |    SELECT doc_id, p,
        |      count(*) OVER (PARTITION BY gram) AS n,
        |      row_number() OVER (PARTITION BY gram ORDER BY doc_id, p)
        |        AS rn
        |    FROM g)
        |  WHERE n >= 2 AND rn >= 2
        |), brk AS (
        |  SELECT doc_id, p, CASE WHEN p > lag(p) OVER
        |      (PARTITION BY doc_id ORDER BY p) + 8 THEN 1 ELSE 0 END AS b
        |  FROM d
        |), isl AS (
        |  SELECT doc_id, p, sum(b) OVER (PARTITION BY doc_id ORDER BY p
        |    ROWS UNBOUNDED PRECEDING) AS island
        |  FROM brk
        |)
        |SELECT doc_id, CAST(min(p) - 1 AS INT) AS span_start,
        |  CAST(max(p) - 1 + 8 AS INT) AS span_end
        |FROM isl GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin),

    // same floor-of-identical-doubles argument as q_repetition: the
    // double widening, the division, and the floor are all IEEE-exact
    // replays of the Spark plan, and the emitted scale is the exact
    // divisor (a widened float, bit-identical in both engines)
    "q_embed_quantize" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), m AS (
        |  SELECT vec_id, v,
        |    list_max(list_transform(v, x -> abs(x))) AS maxabs
        |  FROM e
        |)
        |SELECT vec_id, maxabs AS scale,
        |  array_to_string(CASE WHEN maxabs = 0
        |      THEN list_transform(v, x -> 0)
        |      ELSE list_transform(v, x ->
        |        CAST(greatest(-127, floor(x * 127.0 / maxabs)) AS INT))
        |    END, ',') AS q8
        |FROM m ORDER BY vec_id""".stripMargin,

    // pinned-codebook replay of the deterministic PQ pipeline (valid at
    // the gate SF only — Verify omits it elsewhere, the q_ann_ivf rule)
    "q_ann_pq" -> graft.queries.PqOracle.sql,
    "q_ann_ivfpq" -> graft.queries.IvfPqOracle.sql,
    "q_ann_ivfpq_res" -> graft.queries.IvfPqOracle.sqlResidual,

    // pinned-centroid replay of the deterministic IVF pipeline (valid at
    // the gate SF; see IvfOracle's scaladoc for the regeneration recipe)
    "q_ann_ivf" -> IvfOracle.sql,
    // the persisted build→compact→probe cycle serves the identical
    // ranking (shared quantizer + pure-data-movement compaction), so
    // it shares the pinned-centroid oracle — the dedupIndexProbeOracle
    // convention
    "q_ann_index_compact" -> IvfOracle.sql,
    // build→retrain-from-stored-vectors→probe: the deterministic
    // order-insensitive training body reproduces the same quantizer
    // from the persisted rows, so the retrained generation serves the
    // identical ranking — same pinned-centroid oracle
    "q_ann_retrain" -> IvfOracle.sql,

    // the q_ann_cosine ranking CTE + same-label truth + metrics; the
    // discount/ideal tables are the SAME Scala-computed literals the
    // operator embeds (Relevance.dcgDiscounts/dcgIdealPrefix)
    "q_ranking_metrics" -> {
      val disc = graft.operators.Relevance.dcgDiscounts(10)
        .mkString("[", ", ", "]")
      val ideal = graft.operators.Relevance.dcgIdealPrefix(10)
        .mkString("[", ", ", "]")
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
        |    label AS ql
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
        |      AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, id) AS rank
        |  FROM scored
        |), r AS (
        |  SELECT query_id, id, CAST(rank AS INT) AS rank
        |  FROM ranked WHERE rank <= 10
        |), t AS (
        |  SELECT q.query_id, e.vec_id AS id
        |  FROM embeddings e JOIN q ON e.label = q.ql
        |  WHERE e.vec_id != q.query_id
        |), nrel AS (
        |  SELECT query_id, count(*) AS n_rel FROM t GROUP BY query_id
        |), hitrows AS (
        |  -- hit ordinal in (rank, id) order = cumulative hits at each
        |  -- hit's rank, the precision@rank numerator MAP needs
        |  SELECT r.query_id, r.id, r.rank,
        |    row_number() OVER (PARTITION BY r.query_id
        |      ORDER BY r.rank, r.id) AS cum
        |  FROM r JOIN t USING (query_id, id)
        |), hits AS (
        |  -- CAST the sums: DuckDB sum() promotes to HUGEINT
        |  SELECT query_id, count(*) AS n_hits, min(rank) AS frst,
        |    CAST(sum(($disc)[rank]) AS BIGINT) AS dcg_q,
        |    CAST(sum(cum * 1000000 // rank) AS BIGINT) AS ap_num
        |  FROM hitrows GROUP BY query_id
        |)
        |SELECT nrel.query_id, n_rel,
        |  coalesce(n_hits, 0) AS n_hits,
        |  coalesce(n_hits, 0) * 1000000 // n_rel AS recall_ppm,
        |  coalesce(CAST(1000000 AS BIGINT) // frst, 0) AS mrr_ppm,
        |  coalesce(dcg_q, 0) * 1000000
        |    // ($ideal)[CAST(least(n_rel, 10) AS INT)] AS ndcg_ppm,
        |  coalesce(n_hits, 0) * 1000000 // 10 AS precision_ppm,
        |  coalesce(ap_num, 0) // least(n_rel, 10) AS map_ppm
        |FROM nrel LEFT JOIN hits USING (query_id)
        |ORDER BY query_id""".stripMargin
    },

    // the multi-cutoff replay: the single-k CTE chain cross-joined
    // with the cutoff list; hit ordinals computed once at max(k)
    "q_ranking_metrics_at" -> {
      val disc = graft.operators.Relevance.dcgDiscounts(10)
        .mkString("[", ", ", "]")
      val ideal = graft.operators.Relevance.dcgIdealPrefix(10)
        .mkString("[", ", ", "]")
      s"""WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
        |    label AS ql
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
        |      AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, id) AS rank
        |  FROM scored
        |), r AS (
        |  SELECT query_id, id, CAST(rank AS INT) AS rank
        |  FROM ranked WHERE rank <= 10
        |), t AS (
        |  SELECT q.query_id, e.vec_id AS id
        |  FROM embeddings e JOIN q ON e.label = q.ql
        |  WHERE e.vec_id != q.query_id
        |), nrel AS (
        |  SELECT query_id, count(*) AS n_rel FROM t GROUP BY query_id
        |), ks(k) AS (VALUES (1), (5), (10)),
        |hitrows AS (
        |  SELECT r.query_id, r.id, r.rank,
        |    row_number() OVER (PARTITION BY r.query_id
        |      ORDER BY r.rank, r.id) AS cum
        |  FROM r JOIN t USING (query_id, id)
        |), hits AS (
        |  SELECT h.query_id, ks.k, count(*) AS n_hits,
        |    min(h.rank) AS frst,
        |    CAST(sum(($disc)[h.rank]) AS BIGINT) AS dcg_q,
        |    CAST(sum(h.cum * 1000000 // h.rank) AS BIGINT) AS ap_num
        |  FROM hitrows h CROSS JOIN ks WHERE h.rank <= ks.k
        |  GROUP BY 1, 2
        |), base AS (
        |  SELECT nrel.query_id, ks.k, n_rel FROM nrel CROSS JOIN ks
        |)
        |SELECT base.query_id, base.k, n_rel,
        |  coalesce(n_hits, 0) AS n_hits,
        |  coalesce(n_hits, 0) * 1000000 // n_rel AS recall_ppm,
        |  coalesce(CAST(1000000 AS BIGINT) // frst, 0) AS mrr_ppm,
        |  coalesce(dcg_q, 0) * 1000000
        |    // ($ideal)[CAST(least(n_rel, base.k) AS INT)] AS ndcg_ppm,
        |  coalesce(n_hits, 0) * 1000000 // base.k AS precision_ppm,
        |  coalesce(ap_num, 0) // least(n_rel, base.k) AS map_ppm
        |FROM base LEFT JOIN hits
        |  ON hits.query_id = base.query_id AND hits.k = base.k
        |ORDER BY base.query_id, base.k""".stripMargin
    },

    // chrF replay: the same multiset gram extraction per order 1..6
    // (range bound exact, so no descending-sequence or short-gram
    // edge exists), side-tagged counts off ONE union (a gram absent
    // from a side reads 0 — no join), ppm quantization per order,
    // integer order-average and F-score
    "q_chrf" -> {
      val sides = for {
        n <- 1 to 6
        (c, wh, wr) <- Seq(("hs", 1, 0), ("rs", 0, 1))
      } yield
        s"""SELECT doc_id, $n AS n,
           |  unnest(list_transform(range(1, greatest(len($c) - ${n - 1}, 0) + 1),
           |    i -> substr($c, i, $n))) AS g, $wh AS wh, $wr AS wr
           |FROM p""".stripMargin
      s"""WITH p AS (
         |  SELECT doc_id,
         |    regexp_replace(hyp, '\\s+', '', 'g') AS hs,
         |    regexp_replace(ref, '\\s+', '', 'g') AS rs
         |  FROM ($evalPairsSql)
         |), gr AS (
         |${sides.mkString("\nUNION ALL\n")}
         |), counts AS (
         |  SELECT doc_id, n, g, CAST(sum(wh) AS BIGINT) AS ch,
         |    CAST(sum(wr) AS BIGINT) AS cr
         |  FROM gr GROUP BY 1, 2, 3
         |), per_order AS (
         |  SELECT doc_id, n, CAST(sum(least(ch, cr)) AS BIGINT) AS m,
         |    CAST(sum(ch) AS BIGINT) AS ht, CAST(sum(cr) AS BIGINT) AS rt
         |  FROM counts GROUP BY 1, 2
         |), pq AS (
         |  SELECT doc_id,
         |    coalesce(m * 1000000 // nullif(ht, 0), 0) AS pr,
         |    coalesce(m * 1000000 // nullif(rt, 0), 0) AS rc
         |  FROM per_order
         |), agg AS (
         |  SELECT doc_id, CAST(sum(pr) // 6 AS BIGINT) AS prec_ppm,
         |    CAST(sum(rc) // 6 AS BIGINT) AS rec_ppm
         |  FROM pq GROUP BY 1
         |)
         |SELECT p.doc_id, coalesce(prec_ppm, 0) AS prec_ppm,
         |  coalesce(rec_ppm, 0) AS rec_ppm,
         |  coalesce((5 * prec_ppm * rec_ppm) //
         |    nullif(4 * prec_ppm + rec_ppm, 0), 0) AS chrf_ppm
         |FROM p LEFT JOIN agg USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // token F1: the clipped-overlap replay at token grain — the
    // side-tagged union-count shape proves the native two-pointer
    // kernel against a fully relational computation
    "q_token_f1" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(hyp)), '\\s+'),
         |      x -> len(x) > 0) AS ht,
         |    list_filter(string_split_regex(lower(trim(ref)), '\\s+'),
         |      x -> len(x) > 0) AS rt
         |  FROM ($evalPairsSql)
         |), gr AS (
         |  SELECT doc_id, unnest(ht) AS t, 1 AS wh, 0 AS wr FROM p
         |  UNION ALL
         |  SELECT doc_id, unnest(rt) AS t, 0 AS wh, 1 AS wr FROM p
         |), counts AS (
         |  SELECT doc_id, t, CAST(sum(wh) AS BIGINT) AS ch,
         |    CAST(sum(wr) AS BIGINT) AS cr
         |  FROM gr GROUP BY 1, 2
         |), m AS (
         |  SELECT doc_id, CAST(sum(least(ch, cr)) AS BIGINT) AS n_match
         |  FROM counts GROUP BY 1
         |), pr AS (
         |  SELECT p.doc_id, coalesce(n_match, 0) AS n_match,
         |    CAST(len(ht) AS BIGINT) AS n_hyp,
         |    CAST(len(rt) AS BIGINT) AS n_ref,
         |    CASE WHEN len(ht) = 0 THEN 0
         |      ELSE coalesce(n_match, 0) * 1000000 // len(ht) END
         |      AS prec_ppm,
         |    CASE WHEN len(rt) = 0 THEN 0
         |      ELSE coalesce(n_match, 0) * 1000000 // len(rt) END
         |      AS rec_ppm
         |  FROM p LEFT JOIN m USING (doc_id)
         |)
         |SELECT doc_id, n_match, n_hyp, n_ref,
         |  CAST(prec_ppm AS BIGINT) AS prec_ppm,
         |  CAST(rec_ppm AS BIGINT) AS rec_ppm,
         |  CAST(CASE WHEN prec_ppm + rec_ppm = 0 THEN 0
         |    ELSE 2 * prec_ppm * rec_ppm // (prec_ppm + rec_ppm) END
         |    AS BIGINT) AS f1_ppm
         |FROM pr ORDER BY doc_id""".stripMargin,

    // ROUGE-L: the LCS row DP in PREFIX-MAX form as a recursive CTE —
    // dp_i[j] = max(dp_{i-1}[j], max_{j'<=j, rt[j']=ht[i]}
    // (dp_{i-1}[j'-1]+1)) — the same recurrence the Spark-side
    // cross-check fold runs (EvalMetrics.lcsLenViaFold), eliminating
    // the classic recurrence's within-row dependency so the row step
    // is one list_transform; integer DP + ppm divisions replay the
    // native kernel bit-for-bit
    "q_rouge_l" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(hyp)), '\\s+'),
         |      x -> len(x) > 0) AS ht,
         |    list_filter(string_split_regex(lower(trim(ref)), '\\s+'),
         |      x -> len(x) > 0) AS rt
         |  FROM ($evalPairsSql)
         |), lcs AS (
         |  SELECT doc_id, ht, rt, 0 AS i,
         |    list_transform(range(0, len(rt) + 1),
         |      x -> CAST(0 AS BIGINT)) AS dp
         |  FROM p
         |  UNION ALL
         |  SELECT doc_id, ht, rt, i + 1,
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len(rt) + 1), j ->
         |        greatest(dp[j + 1],
         |          coalesce(list_max(list_transform(range(1, j + 1),
         |            jp -> CASE WHEN rt[jp] = ht[i + 1]
         |              THEN dp[jp] + 1 ELSE NULL END)),
         |            CAST(0 AS BIGINT)))))
         |  FROM lcs WHERE i < len(ht)
         |), fin AS (
         |  SELECT doc_id, dp[len(rt) + 1] AS lcs_len,
         |    CAST(len(ht) AS BIGINT) AS n_hyp,
         |    CAST(len(rt) AS BIGINT) AS n_ref
         |  FROM lcs WHERE i = len(ht)
         |), pr AS (
         |  SELECT doc_id, coalesce(lcs_len, 0) AS lcs_len, n_hyp, n_ref,
         |    CASE WHEN n_hyp = 0 THEN 0
         |      ELSE coalesce(lcs_len, 0) * 1000000 // n_hyp END AS prec_ppm,
         |    CASE WHEN n_ref = 0 THEN 0
         |      ELSE coalesce(lcs_len, 0) * 1000000 // n_ref END AS rec_ppm
         |  FROM fin
         |)
         |SELECT doc_id, CAST(lcs_len AS BIGINT) AS lcs_len, n_hyp, n_ref,
         |  CAST(prec_ppm AS BIGINT) AS prec_ppm,
         |  CAST(rec_ppm AS BIGINT) AS rec_ppm,
         |  CAST(CASE WHEN prec_ppm + rec_ppm = 0 THEN 0
         |    ELSE 2 * prec_ppm * rec_ppm // (prec_ppm + rec_ppm) END
         |    AS BIGINT) AS rouge_l_ppm
         |FROM pr ORDER BY doc_id""".stripMargin,

    // ROUGE-2: the q_token_f1 union-agg clipped-count shape over
    // bigram lists (same tokenization, same ppm arithmetic)
    "q_rouge_2" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(hyp)), '\\s+'),
         |      x -> len(x) > 0) AS ht,
         |    list_filter(string_split_regex(lower(trim(ref)), '\\s+'),
         |      x -> len(x) > 0) AS rt
         |  FROM ($evalPairsSql)
         |), g AS (
         |  SELECT doc_id,
         |    list_transform(range(1, greatest(len(ht) - 1, 0) + 1),
         |      i -> array_to_string(ht[i:i+1], ' ')) AS hg,
         |    list_transform(range(1, greatest(len(rt) - 1, 0) + 1),
         |      i -> array_to_string(rt[i:i+1], ' ')) AS rg
         |  FROM p
         |), gr AS (
         |  SELECT doc_id, unnest(hg) AS t, 1 AS wh, 0 AS wr FROM g
         |  UNION ALL
         |  SELECT doc_id, unnest(rg) AS t, 0 AS wh, 1 AS wr FROM g
         |), counts AS (
         |  SELECT doc_id, t, CAST(sum(wh) AS BIGINT) AS ch,
         |    CAST(sum(wr) AS BIGINT) AS cr
         |  FROM gr GROUP BY 1, 2
         |), m AS (
         |  SELECT doc_id, CAST(sum(least(ch, cr)) AS BIGINT) AS n_match
         |  FROM counts GROUP BY 1
         |), pr AS (
         |  SELECT g.doc_id, coalesce(n_match, 0) AS n_match,
         |    CAST(len(hg) AS BIGINT) AS n_hyp_grams,
         |    CAST(len(rg) AS BIGINT) AS n_ref_grams,
         |    CASE WHEN len(hg) = 0 THEN 0
         |      ELSE coalesce(n_match, 0) * 1000000 // len(hg) END
         |      AS prec_ppm,
         |    CASE WHEN len(rg) = 0 THEN 0
         |      ELSE coalesce(n_match, 0) * 1000000 // len(rg) END
         |      AS rec_ppm
         |  FROM g LEFT JOIN m USING (doc_id)
         |)
         |SELECT doc_id, n_match, n_hyp_grams, n_ref_grams,
         |  CAST(prec_ppm AS BIGINT) AS prec_ppm,
         |  CAST(rec_ppm AS BIGINT) AS rec_ppm,
         |  CAST(CASE WHEN prec_ppm + rec_ppm = 0 THEN 0
         |    ELSE 2 * prec_ppm * rec_ppm // (prec_ppm + rec_ppm) END
         |    AS BIGINT) AS f1_ppm
         |FROM pr ORDER BY doc_id""".stripMargin,

    // ROUGE-Lsum: the 6-word fold, then per-(ref sentence, hyp
    // sentence) prefix AND suffix LCS DPs as two recursive CTEs (the
    // q_rouge_l row DP run forward and over reversed lists), the
    // alignment-independent union membership test fwd(p−1,q−1) + 1 +
    // bwd(m−p,n−q) = L — DP values only, no backtrack, so it provably
    // equals the Spark kernel on every input — and rouge-score's
    // GLOBAL token clipping in closed form: per token, member
    // positions count only up to the hypothesis's supply
    // (Σ_t least(k_t, c_t) — token counters are independent, so the
    // sequential decrement order cannot matter)
    "q_rouge_lsum" ->
      s"""WITH RECURSIVE p AS (
         |  SELECT doc_id,
         |    array_to_string(list_transform(
         |      range(0, CAST(ceil(len(hw) / 6.0) AS BIGINT)),
         |      j -> array_to_string(hw[j*6+1:j*6+6], ' ')), chr(10)) AS hyp,
         |    array_to_string(list_transform(
         |      range(0, CAST(ceil(len(rw) / 6.0) AS BIGINT)),
         |      j -> array_to_string(rw[j*6+1:j*6+6], ' ')), chr(10)) AS ref
         |  FROM (SELECT doc_id, string_split(hyp, ' ') AS hw,
         |        string_split(ref, ' ') AS rw FROM ($evalPairsSql))
         |), sentH AS (
         |  SELECT doc_id, u.si AS hi, u.toks
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
         |      j -> struct_pack(si := j,
         |        toks := list_filter(
         |          string_split_regex(lower(trim(ls[j])), '\\s+'),
         |          x -> len(x) > 0)))) AS u
         |    FROM (SELECT doc_id, string_split(hyp, chr(10)) AS ls FROM p))
         |  WHERE len(u.toks) > 0
         |), sentR AS (
         |  SELECT doc_id, u.si AS ri, u.toks
         |  FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, len(ls) + 1),
         |      j -> struct_pack(si := j,
         |        toks := list_filter(
         |          string_split_regex(lower(trim(ls[j])), '\\s+'),
         |          x -> len(x) > 0)))) AS u
         |    FROM (SELECT doc_id, string_split(ref, chr(10)) AS ls FROM p))
         |  WHERE len(u.toks) > 0
         |), totals AS (
         |  SELECT p.doc_id,
         |    coalesce(h.n, 0) AS n_hyp, coalesce(r.m, 0) AS n_ref
         |  FROM p
         |  LEFT JOIN (SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n
         |             FROM sentH GROUP BY 1) h USING (doc_id)
         |  LEFT JOIN (SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS m
         |             FROM sentR GROUP BY 1) r USING (doc_id)
         |), sp AS (
         |  SELECT r.doc_id, r.ri, h.hi, r.toks AS rt, h.toks AS ct
         |  FROM sentR r JOIN sentH h USING (doc_id)
         |), fwd AS (
         |  SELECT doc_id, ri, hi, rt, ct, 0 AS i,
         |    list_transform(range(0, len(ct) + 1),
         |      x -> CAST(0 AS BIGINT)) AS dp
         |  FROM sp
         |  UNION ALL
         |  SELECT doc_id, ri, hi, rt, ct, i + 1,
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len(ct) + 1), j ->
         |        greatest(dp[j + 1],
         |          coalesce(list_max(list_transform(range(1, j + 1),
         |            jp -> CASE WHEN ct[jp] = rt[i + 1]
         |              THEN dp[jp] + 1 ELSE NULL END)),
         |            CAST(0 AS BIGINT)))))
         |  FROM fwd WHERE i < len(rt)
         |), spR AS (
         |  SELECT doc_id, ri, hi, list_reverse(rt) AS rt,
         |    list_reverse(ct) AS ct
         |  FROM sp
         |), bwd AS (
         |  SELECT doc_id, ri, hi, rt, ct, 0 AS i,
         |    list_transform(range(0, len(ct) + 1),
         |      x -> CAST(0 AS BIGINT)) AS dp
         |  FROM spR
         |  UNION ALL
         |  SELECT doc_id, ri, hi, rt, ct, i + 1,
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, len(ct) + 1), j ->
         |        greatest(dp[j + 1],
         |          coalesce(list_max(list_transform(range(1, j + 1),
         |            jp -> CASE WHEN ct[jp] = rt[i + 1]
         |              THEN dp[jp] + 1 ELSE NULL END)),
         |            CAST(0 AS BIGINT)))))
         |  FROM bwd WHERE i < len(rt)
         |), tot AS (
         |  SELECT doc_id, ri, hi, dp[len(ct) + 1] AS L,
         |    len(rt) AS m, len(ct) AS n
         |  FROM fwd WHERE i = len(rt)
         |), mk AS (
         |  SELECT f.doc_id, f.ri, f.i + 1 AS pos,
         |    coalesce(list_max(list_transform(range(1, t.n + 1), q ->
         |      CASE WHEN f.rt[f.i + 1] = f.ct[q]
         |        AND f.dp[q] + 1 + b.dp[(t.n - q) + 1] = t.L
         |      THEN 1 ELSE 0 END)), 0) AS hit
         |  FROM fwd f
         |  JOIN tot t ON t.doc_id = f.doc_id AND t.ri = f.ri
         |    AND t.hi = f.hi
         |  JOIN bwd b ON b.doc_id = f.doc_id AND b.ri = f.ri
         |    AND b.hi = f.hi AND b.i = t.m - (f.i + 1)
         |  WHERE f.i < t.m
         |), um AS (
         |  SELECT doc_id, ri, pos, max(hit) AS hit FROM mk GROUP BY 1, 2, 3
         |), mtok AS (
         |  SELECT u.doc_id, r.toks[u.pos] AS tok, count(*) AS k
         |  FROM um u JOIN sentR r ON r.doc_id = u.doc_id AND r.ri = u.ri
         |  WHERE u.hit = 1
         |  GROUP BY 1, 2
         |), hypc AS (
         |  SELECT doc_id, t AS tok, count(*) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS t FROM sentH)
         |  GROUP BY 1, 2
         |), hits AS (
         |  SELECT m.doc_id,
         |    CAST(sum(least(m.k, h.c)) AS BIGINT) AS union_hits
         |  FROM mtok m JOIN hypc h USING (doc_id, tok)
         |  GROUP BY 1
         |), pr AS (
         |  SELECT t.doc_id, coalesce(h.union_hits, 0) AS union_hits,
         |    t.n_hyp, t.n_ref,
         |    CASE WHEN t.n_hyp = 0 THEN 0
         |      ELSE coalesce(h.union_hits, 0) * 1000000 // t.n_hyp END
         |      AS prec_ppm,
         |    CASE WHEN t.n_ref = 0 THEN 0
         |      ELSE coalesce(h.union_hits, 0) * 1000000 // t.n_ref END
         |      AS rec_ppm
         |  FROM totals t LEFT JOIN hits h USING (doc_id)
         |)
         |SELECT doc_id, CAST(union_hits AS BIGINT) AS union_hits,
         |  CAST(n_hyp AS BIGINT) AS n_hyp, CAST(n_ref AS BIGINT) AS n_ref,
         |  CAST(prec_ppm AS BIGINT) AS prec_ppm,
         |  CAST(rec_ppm AS BIGINT) AS rec_ppm,
         |  CAST(CASE WHEN prec_ppm + rec_ppm = 0 THEN 0
         |    ELSE 2 * prec_ppm * rec_ppm // (prec_ppm + rec_ppm) END
         |    AS BIGINT) AS rouge_lsum_ppm
         |FROM pr ORDER BY doc_id""".stripMargin,

    // diagonal-Fréchet: exact integer per-dim moments (the Spark side
    // quantizes first, so Σq/Σq² commute), then the identical double
    // tree — μ, population var (greatest-0 clamped), (√va − √vb)²,
    // per-dim floor to micro units de-quantized by scale², integer
    // cross-dim sums
    "q_embed_fd" ->
      """WITH ea AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 1024) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 2 = 0
        |), eb AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor((x * 1.02 + 0.01) * 1024) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 2 = 1
        |), sa AS (
        |  SELECT j AS dim, CAST(count(*) AS BIGINT) AS n_a,
        |    CAST(sum(q[j]) AS BIGINT) AS s_a,
        |    CAST(sum(q[j] * q[j]) AS BIGINT) AS ss_a
        |  FROM ea CROSS JOIN range(1, 65) r(j) GROUP BY j
        |), sb AS (
        |  SELECT j AS dim, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(q[j]) AS BIGINT) AS s_b,
        |    CAST(sum(q[j] * q[j]) AS BIGINT) AS ss_b
        |  FROM eb CROSS JOIN range(1, 65) r(j) GROUP BY j
        |), pd AS (
        |  SELECT n_a, n_b,
        |    CAST(floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      * 1000000.0 / 1048576.0) AS BIGINT) AS mean_q,
        |    CAST(floor((sqrt(greatest(
        |        CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |          * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)), 0.0))
        |      - sqrt(greatest(
        |        CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)), 0.0)))
        |      * (sqrt(greatest(
        |        CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |          * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)), 0.0))
        |      - sqrt(greatest(
        |        CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)), 0.0)))
        |      * 1000000.0 / 1048576.0) AS BIGINT) AS var_q
        |  FROM sa JOIN sb USING (dim)
        |)
        |SELECT CAST(count(*) AS BIGINT) AS dims,
        |  CAST(min(n_a) AS BIGINT) AS n_a,
        |  CAST(min(n_b) AS BIGINT) AS n_b,
        |  CAST(sum(mean_q) AS BIGINT) AS mean_term_micro,
        |  CAST(sum(var_q) AS BIGINT) AS var_term_micro,
        |  CAST(sum(mean_q) + sum(var_q) AS BIGINT) AS fd_micro
        |FROM pd""".stripMargin,

    // AnnIndex.driftSince: the SAME diagonal-Fréchet replay with the
    // index's sides — side A is the shifted odd-id batch, side B the
    // full build corpus (whose moments build() froze; moments are a
    // pure function of the corpus, so the oracle needs no index tree)
    "q_ann_drift" ->
      """WITH ea AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor((x * 1.02 + 0.01) * 1024) AS BIGINT)) AS q
        |  FROM embeddings WHERE vec_id % 2 = 1
        |), eb AS (
        |  SELECT list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor(x * 1024) AS BIGINT)) AS q
        |  FROM embeddings
        |), sa AS (
        |  SELECT j AS dim, CAST(count(*) AS BIGINT) AS n_a,
        |    CAST(sum(q[j]) AS BIGINT) AS s_a,
        |    CAST(sum(q[j] * q[j]) AS BIGINT) AS ss_a
        |  FROM ea CROSS JOIN range(1, 65) r(j) GROUP BY j
        |), sb AS (
        |  SELECT j AS dim, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(sum(q[j]) AS BIGINT) AS s_b,
        |    CAST(sum(q[j] * q[j]) AS BIGINT) AS ss_b
        |  FROM eb CROSS JOIN range(1, 65) r(j) GROUP BY j
        |), pd AS (
        |  SELECT n_a, n_b,
        |    CAST(floor((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |      * 1000000.0 / 1048576.0) AS BIGINT) AS mean_q,
        |    CAST(floor((sqrt(greatest(
        |        CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |          * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)), 0.0))
        |      - sqrt(greatest(
        |        CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)), 0.0)))
        |      * (sqrt(greatest(
        |        CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |        - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        |          * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)), 0.0))
        |      - sqrt(greatest(
        |        CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        |        - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        |          * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)), 0.0)))
        |      * 1000000.0 / 1048576.0) AS BIGINT) AS var_q
        |  FROM sa JOIN sb USING (dim)
        |)
        |SELECT CAST(count(*) AS BIGINT) AS dims,
        |  CAST(min(n_a) AS BIGINT) AS n_a,
        |  CAST(min(n_b) AS BIGINT) AS n_b,
        |  CAST(sum(mean_q) AS BIGINT) AS mean_term_micro,
        |  CAST(sum(var_q) AS BIGINT) AS var_term_micro,
        |  CAST(sum(mean_q) + sum(var_q) AS BIGINT) AS fd_micro
        |FROM pd""".stripMargin,

    // log-BLEU: token n-gram clipped counts per order via the chrF
    // union-count shape, then the SAME double expression tree (ln of
    // identical IEEE ratios, same association order) — one
    // transcendental layer, no exp
    "q_log_bleu" -> {
      val orders = 1 to 4
      val sides = for {
        n <- orders
        (c, wh, wr) <- Seq(("ht", 1, 0), ("rt", 0, 1))
      } yield
        s"""SELECT doc_id, $n AS n,
           |  unnest(list_transform(range(1, greatest(len($c) - ${n - 1}, 0) + 1),
           |    i -> array_to_string($c[i:i+${n - 1}], ' '))) AS g,
           |  $wh AS wh, $wr AS wr
           |FROM p""".stripMargin
      val lnSum = orders.map(n =>
        s"(CASE WHEN t$n > 0 THEN " +
          s"ln(CAST(m$n + 1 AS DOUBLE) / CAST(t$n + 1 AS DOUBLE)) " +
          s"ELSE 0.0 END)").mkString(" + ")
      val eff = orders.map(n =>
        s"(CASE WHEN t$n > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      val mCols = orders.map(n =>
        s"coalesce(max(CASE WHEN n = $n THEN m END), 0) AS m$n")
        .mkString(",\n    ")
      val tCols = orders.map(n =>
        s"greatest(max(n_hyp) - ${n - 1}, 0) AS t$n")
        .mkString(",\n    ")
      s"""WITH p AS (
         |  SELECT doc_id,
         |    list_filter(string_split_regex(lower(trim(hyp)), '\\s+'),
         |      x -> len(x) > 0) AS ht,
         |    list_filter(string_split_regex(lower(trim(ref)), '\\s+'),
         |      x -> len(x) > 0) AS rt
         |  FROM ($evalPairsSql)
         |), sized AS (
         |  SELECT doc_id, len(ht) AS n_hyp, len(rt) AS n_ref FROM p
         |  WHERE len(ht) > 0 AND len(rt) > 0
         |), gr AS (
         |${sides.mkString("\nUNION ALL\n")}
         |), counts AS (
         |  SELECT doc_id, n, g, CAST(sum(wh) AS BIGINT) AS ch,
         |    CAST(sum(wr) AS BIGINT) AS cr
         |  FROM gr GROUP BY 1, 2, 3
         |), perorder AS (
         |  SELECT doc_id, n, CAST(sum(least(ch, cr)) AS BIGINT) AS m
         |  FROM counts GROUP BY 1, 2
         |), wide AS (
         |  SELECT s.doc_id, CAST(max(n_hyp) AS BIGINT) AS n_hyp,
         |    CAST(max(n_ref) AS BIGINT) AS n_ref,
         |    $mCols,
         |    $tCols
         |  FROM sized s LEFT JOIN perorder o USING (doc_id)
         |  GROUP BY s.doc_id
         |)
         |SELECT doc_id, n_hyp, n_ref,
         |  CAST(floor((least(0.0, 1.0 - CAST(n_ref AS DOUBLE) /
         |    CAST(n_hyp AS DOUBLE)) + ($lnSum) / CAST(($eff) AS DOUBLE))
         |    * 1000000.0) AS BIGINT) AS log_bleu_micro
         |FROM wide ORDER BY doc_id""".stripMargin
    },

    // CER: both engines' levenshtein is the same plain unit-cost edit
    // distance; whitespace normalized identically before comparing
    "q_cer" ->
      s"""WITH p AS (
         |  SELECT doc_id,
         |    regexp_replace(trim(hyp), '\\s+', ' ', 'g') AS h,
         |    regexp_replace(trim(ref), '\\s+', ' ', 'g') AS r
         |  FROM ($evalPairsSql)
         |)
         |SELECT doc_id, CAST(levenshtein(h, r) AS BIGINT) AS edit_dist,
         |  CAST(length(r) AS BIGINT) AS ref_chars,
         |  CAST(levenshtein(h, r) * 1000000 // length(r) AS BIGINT)
         |    AS cer_ppm
         |FROM p WHERE r IS NOT NULL AND length(r) > 0 AND h IS NOT NULL
         |ORDER BY doc_id""".stripMargin,

    // distinct-n: word n-grams per order off one token split, exact
    // COUNT(DISTINCT) both sides
    "q_distinct_ngrams" -> {
      val sides = (1 to 3).map(n =>
        s"""SELECT source, $n AS n,
           |  unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
           |    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
           |FROM toks""".stripMargin)
      s"""WITH toks AS (
         |  SELECT source, list_filter(string_split_regex(lower(trim(text)),
         |    '\\s+'), x -> len(x) > 0) AS t
         |  FROM documents WHERE text IS NOT NULL
         |), gr AS (
         |${sides.mkString("\nUNION ALL\n")}
         |)
         |SELECT source, n, CAST(count(*) AS BIGINT) AS total_ngrams,
         |  CAST(count(DISTINCT g) AS BIGINT) AS distinct_ngrams,
         |  CAST(count(DISTINCT g) * 1000000 // count(*) AS BIGINT)
         |    AS distinct_ppm
         |FROM gr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    // approximate distinct-n: the same gram stream through the full
    // HLL replay (q_hll_distinct estimator SQL, keyed by (source, n),
    // registers carrying bucket counts so totals need no second gram
    // aggregation)
    "q_distinct_ngrams_approx" -> {
      val sides = (1 to 3).map(n =>
        s"""SELECT source, $n AS n,
           |  unnest(list_transform(range(1, greatest(len(t) - ${n - 1}, 0) + 1),
           |    i -> array_to_string(t[i:i+${n - 1}], ' '))) AS g
           |FROM toks""".stripMargin)
      s"""WITH toks AS (
         |  SELECT source, list_filter(string_split_regex(lower(trim(text)),
         |    '\\s+'), x -> len(x) > 0) AS t
         |  FROM documents WHERE text IS NOT NULL
         |), gr AS (
         |${sides.mkString("\nUNION ALL\n")}
         |), h AS (
         |  SELECT source, n,
         |    CAST(md5_number_upper(g) % 72057594037927936 AS BIGINT) AS h
         |  FROM gr
         |), regs AS (
         |  SELECT source, n, h // 17592186044416 AS bucket,
         |    CAST(count(*) AS BIGINT) AS bc,
         |    min(CASE WHEN h % 17592186044416 = 0 THEN 0
         |      ELSE length(bin(h % 17592186044416)) END) AS min_len
         |  FROM h GROUP BY source, n, bucket
         |), agg AS (
         |  SELECT source, n, CAST(sum(bc) AS BIGINT) AS total_ngrams,
         |    CAST(count(*) AS BIGINT) AS n_present,
         |    CAST(sum(CAST(1 AS BIGINT) << CAST(min_len AS INT))
         |        AS BIGINT)
         |      + (4096 - CAST(count(*) AS BIGINT)) * 35184372088832
         |      AS s_scaled
         |  FROM regs GROUP BY source, n
         |), est AS (
         |  SELECT source, n, total_ngrams, n_present, s_scaled,
         |    CAST(floor(4.2566823519294213e20 / CAST(s_scaled AS DOUBLE))
         |      AS BIGINT) AS est_raw_q,
         |    CAST(floor(CASE
         |      WHEN 4.2566823519294213e20 / CAST(s_scaled AS DOUBLE)
         |          <= 10240.0 AND n_present < 4096
         |        THEN 4096.0 * ln(4096.0 /
         |          CAST(4096 - n_present AS DOUBLE))
         |      ELSE 4.2566823519294213e20 / CAST(s_scaled AS DOUBLE)
         |    END) AS BIGINT) AS est_q
         |  FROM agg
         |)
         |SELECT source, n, total_ngrams, n_present, s_scaled,
         |  est_raw_q, est_q,
         |  CAST(est_q * 1000000 // total_ngrams AS BIGINT)
         |    AS distinct_ppm_est
         |FROM est ORDER BY source, n""".stripMargin
    },

    "q_ann_cosine" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, id, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, id, rank, round(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // q_ann_cosine's replay with list_inner_product in place of
    // list_cosine_similarity: both engines accumulate the dot
    // sequentially over identical doubles, so the ranking is exact
    "q_mips" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qv) AS dot
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.query_id
        |), ranked AS (
        |  SELECT query_id, id, dot,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, id, rank, round(dot, 6) AS dot
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_mips_alsh" -> mipsAlshOracle,

    // width-planner replay (alshBitsFor) + the same ALSH pipeline with
    // the 62-plane signature masked to the planned width
    "q_mips_alsh_planned" -> mipsAlshPlannedOracle,

    // full replay of the BT MM recursion: same matches, same integer
    // per-edge terms, clamps and mean normalization, 5 unrolled
    // iterations via btCtes
    "q_bt_rank" ->
      (("""WITH scored AS (
        |  SELECT doc_id,
        |    """ + graft.functions.TextFunctions.prefScoreSql("text") +
        """ AS score
        |  FROM documents WHERE doc_id < 120 AND text IS NOT NULL
        |), m AS MATERIALIZED (
        |  SELECT
        |    CASE WHEN a.score >= b.score THEN a.doc_id ELSE b.doc_id END
        |      AS winner,
        |    CASE WHEN a.score >= b.score THEN b.doc_id ELSE a.doc_id END
        |      AS loser
        |  FROM scored a JOIN scored b
        |    ON b.doc_id > a.doc_id AND b.doc_id <= a.doc_id + 4
        |), pairs AS (
        |  SELECT least(winner, loser) AS lo, greatest(winner, loser) AS hi,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM m GROUP BY 1, 2
        |), sym AS MATERIALIZED (
        |  SELECT lo AS src, hi AS dst, n FROM pairs
        |  UNION ALL SELECT hi, lo, n FROM pairs
        |), w AS (
        |  SELECT winner AS item, CAST(count(*) AS BIGINT) AS wins
        |  FROM m GROUP BY 1
        |), items AS MATERIALIZED (
        |  SELECT s.src AS item, coalesce(any_value(w.wins), 0) AS wins,
        |    CAST(sum(s.n) AS BIGINT) AS n_matches
        |  FROM sym s LEFT JOIN w ON s.src = w.item
        |  GROUP BY s.src
        |), nn AS MATERIALIZED (SELECT count(*) AS n_items FROM items)""")
          .stripMargin
        + btCtes(5) + """
        |SELECT i.item, i.wins, i.n_matches, t.p AS strength_q6
        |FROM items i JOIN it5 t ON i.item = t.item
        |ORDER BY i.item""".stripMargin),

    // full replay of the greedy MMR recursion: top-20 integer-dot
    // candidates, pairwise sims, then one pick per recursive step —
    // argmax λppm·rel − (1e6−λppm)·max(sim to chosen), id tiebreak.
    // Every score is an exact BIGINT so the recursion cannot drift.
    "q_mmr" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id AS query_id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000) AS BIGINT)) AS qq
        |  FROM embeddings WHERE vec_id < 5
        |), e AS (
        |  SELECT vec_id AS id,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor(x * 1000) AS BIGINT)) AS v
        |  FROM embeddings
        |), scored AS (
        |  SELECT q.query_id, e.id, e.v,
        |    CAST(list_sum(list_transform(range(1, len(e.v) + 1),
        |      i -> e.v[i] * q.qq[i])) AS BIGINT) AS rel
        |  FROM e CROSS JOIN q
        |  WHERE e.id != q.query_id
        |), cand AS (
        |  SELECT query_id, id, v, rel FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY rel DESC, id) AS rn
        |    FROM scored)
        |  WHERE rn <= 20
        |), sims AS (
        |  SELECT a.query_id, a.id AS ia, b.id AS ib,
        |    CAST(list_sum(list_transform(range(1, len(a.v) + 1),
        |      i -> a.v[i] * b.v[i])) AS BIGINT) AS d
        |  FROM cand a JOIN cand b
        |    ON a.query_id = b.query_id AND a.id != b.id
        |), sel AS (
        |  SELECT query_id, 1 AS step, id, rel AS mmr_num, [id] AS chosen
        |  FROM (
        |    SELECT query_id, id, 700000 * rel AS rel,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY rel DESC, id) AS rn
        |    FROM cand)
        |  WHERE rn = 1
        |  UNION ALL
        |  SELECT query_id, step + 1, id, score, list_append(chosen, id)
        |  FROM (
        |    SELECT s.query_id, s.step, c.id, s.chosen,
        |      700000 * c.rel - 300000 * (
        |        SELECT max(p.d) FROM sims p
        |        WHERE p.query_id = s.query_id AND p.ia = c.id
        |          AND list_contains(s.chosen, p.ib)) AS score,
        |      row_number() OVER (PARTITION BY s.query_id ORDER BY
        |        700000 * c.rel - 300000 * (
        |          SELECT max(p.d) FROM sims p
        |          WHERE p.query_id = s.query_id AND p.ia = c.id
        |            AND list_contains(s.chosen, p.ib)) DESC, c.id) AS rn
        |    FROM sel s JOIN cand c ON c.query_id = s.query_id
        |      AND NOT list_contains(s.chosen, c.id)
        |    WHERE s.step < 8)
        |  WHERE rn = 1
        |)
        |SELECT query_id, CAST(step AS BIGINT) AS pick_rank, id,
        |  mmr_num AS mmr_score
        |FROM sel ORDER BY query_id, pick_rank""".stripMargin,

    // full replay of the pairing: same integer score, same dual-rank
    // windows, same i-th-best × i-th-worst join and strict-margin filter
    // same integer window sums; the only float ops are one sqrt + one
    // divide on identical doubles, so adv_q floors identically
    "q_grpo_adv" ->
      ("""WITH scored AS (
        |  SELECT doc_id,
        |    lang || '|' || CAST(
        |      CAST(md5_number_upper('grpo|' || CAST(doc_id AS VARCHAR))
        |        % 72057594037927936 AS BIGINT) % 8 AS VARCHAR) AS grp,
        |    """ + graft.functions.TextFunctions.prefScoreSql("text") +
        """ AS score
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |), g AS (
        |  SELECT doc_id, grp, score,
        |    count(*) OVER (PARTITION BY grp) AS n,
        |    sum(score) OVER (PARTITION BY grp) AS s1,
        |    sum(score * score) OVER (PARTITION BY grp) AS s2
        |  FROM scored
        |)
        |SELECT doc_id, grp, score,
        |  CASE WHEN n * s2 = s1 * s1 THEN 0
        |    ELSE CAST(floor(CAST(n * score - s1 AS DOUBLE) * 1e6
        |      / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))) AS BIGINT)
        |  END AS adv_q
        |FROM g ORDER BY doc_id""").stripMargin,

    "q_dpo_pairs" ->
      ("""WITH scored AS (
        |  SELECT doc_id,
        |    lang || '|' || CAST(
        |      CAST(md5_number_upper('dpo|' || CAST(doc_id AS VARCHAR))
        |        % 72057594037927936 AS BIGINT) % 8 AS VARCHAR) AS bucket,
        |    """ + graft.functions.TextFunctions.prefScoreSql("text") +
        """ AS score
        |  FROM documents WHERE text IS NOT NULL AND lang IS NOT NULL
        |), ranked AS (
        |  SELECT bucket AS pair_key, doc_id, score,
        |    row_number() OVER (PARTITION BY bucket
        |      ORDER BY score DESC, doc_id) AS r,
        |    count(*) OVER (PARTITION BY bucket) AS n
        |  FROM scored
        |)
        |SELECT c.pair_key, CAST(c.r AS BIGINT) AS pair_idx,
        |  c.doc_id AS chosen_id, j.doc_id AS rejected_id,
        |  CAST(c.score - j.score AS BIGINT) AS margin
        |FROM ranked c JOIN ranked j
        |  ON c.pair_key = j.pair_key AND j.r = c.n - c.r + 1
        |WHERE c.r * 2 <= c.n AND c.score > j.score
        |ORDER BY c.pair_key, pair_idx""").stripMargin,

    // offsets replayed from the same concat tree that builds the render
    // (CAST lengths to INT: DuckDB length() is BIGINT, Spark's is int)
    "q_sft_render" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> length(t) > 0) AS toks
        |  FROM documents WHERE text IS NOT NULL
        |), seg AS (
        |  -- coalesce: DuckDB array_to_string over an empty slice (docs
        |  -- with < 4 tokens) yields NULL where Spark concat_ws gives ''
        |  SELECT doc_id,
        |    coalesce(array_to_string(toks[1 :
        |      CAST(floor(len(toks)*1/4.0) AS INT)], ' '), '') AS u1,
        |    coalesce(array_to_string(toks[CAST(floor(len(toks)*1/4.0) AS INT) + 1 :
        |      CAST(floor(len(toks)*2/4.0) AS INT)], ' '), '') AS a1,
        |    coalesce(array_to_string(toks[CAST(floor(len(toks)*2/4.0) AS INT) + 1 :
        |      CAST(floor(len(toks)*3/4.0) AS INT)], ' '), '') AS u2,
        |    coalesce(array_to_string(toks[CAST(floor(len(toks)*3/4.0) AS INT) + 1 :
        |      len(toks)], ' '), '') AS a2
        |  FROM d
        |), r AS (
        |  SELECT doc_id, u1, a1, u2, a2,
        |    '<|user|> ' || u1 || ' <|assistant|> ' AS p1
        |  FROM seg
        |), r2 AS (
        |  SELECT doc_id, p1, a1, a2,
        |    p1 || a1 || ' <|user|> ' || u2 || ' <|assistant|> ' AS p2,
        |    p1 || a1 || ' <|user|> ' || u2 || ' <|assistant|> ' || a2
        |      AS train_text
        |  FROM r
        |)
        |SELECT doc_id, train_text, turn, start_off, span_len, span_text
        |FROM (
        |  SELECT doc_id, train_text, 1 AS turn,
        |    CAST(length(p1) + 1 AS INT) AS start_off,
        |    CAST(length(a1) AS INT) AS span_len, a1 AS span_text
        |  FROM r2
        |  UNION ALL
        |  SELECT doc_id, train_text, 2 AS turn,
        |    CAST(length(p2) + 1 AS INT),
        |    CAST(length(a2) AS INT), a2
        |  FROM r2
        |)
        |ORDER BY doc_id, turn""".stripMargin,

    // n-turn replay: same segment bounds, element lengths from the
    // same role/content arithmetic (len(role) + len(content) + 6 per
    // prior turn), prefix as a window sum, assistant ordinal as a
    // row_number — offsets replay the operator's aggregate fold
    "q_sft_render_n" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'),
        |      t -> length(t) > 0) AS toks,
        |    CAST(1 + doc_id % 4 AS INT) AS nt
        |  FROM documents WHERE text IS NOT NULL
        |), t AS (
        |  SELECT doc_id, nt, g.k AS k,
        |    CASE WHEN g.k % 2 = 1 THEN 'user' ELSE 'assistant' END
        |      AS role,
        |    coalesce(array_to_string(toks[
        |      CAST(floor(len(toks) * (g.k - 1) / CAST(nt AS DOUBLE))
        |        AS INT) + 1 :
        |      CAST(floor(len(toks) * g.k / CAST(nt AS DOUBLE))
        |        AS INT)], ' '), '') AS content
        |  FROM d CROSS JOIN (SELECT unnest(range(1, 5)) AS k) g
        |  WHERE g.k <= nt
        |), agg AS (
        |  SELECT doc_id,
        |    string_agg('<|' || role || '|> ' || content, ' '
        |      ORDER BY k) AS train_text
        |  FROM t GROUP BY doc_id
        |), offs AS (
        |  SELECT doc_id, k AS turn_pos, role, content,
        |    CAST(coalesce(sum(length(role) + length(content) + 6)
        |        OVER (PARTITION BY doc_id ORDER BY k
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      + length(role) + 6 AS INT) AS start_off,
        |    CAST(length(content) AS INT) AS span_len,
        |    content AS span_text
        |  FROM t
        |), spans AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY turn_pos) AS turn
        |  FROM offs WHERE role = 'assistant'
        |)
        |SELECT s.doc_id, a.train_text, CAST(s.turn AS INT) AS turn,
        |  CAST(s.turn_pos AS INT) AS turn_pos, s.start_off, s.span_len,
        |  s.span_text
        |FROM spans s JOIN agg a USING (doc_id)
        |ORDER BY doc_id, turn""".stripMargin,

    // relational replay of the block fold: unnest blocks → per-block
    // draws (CASE-guarded so %0 never evaluates) → sentinel index k =
    // running count of PRIOR masked blocks → ordered string_agg
    "q_span_corrupt" -> spanCorruptOracle,

    // exact PSM replay: same md5 apply-draw, same two cut points, same
    // substr arithmetic; `||` (not concat()) so null text stays null on
    // both engines
    "q_fim" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS n,
        |    CAST(md5_number_upper('fim|' || CAST(doc_id AS VARCHAR))
        |      % 72057594037927936 AS BIGINT) % 1000000 < 500000 AS hit,
        |    CAST(md5_number_upper('fimA|' || CAST(doc_id AS VARCHAR))
        |      % 72057594037927936 AS BIGINT) % (length(text) + 1) AS a,
        |    CAST(md5_number_upper('fimB|' || CAST(doc_id AS VARCHAR))
        |      % 72057594037927936 AS BIGINT) % (length(text) + 1) AS b
        |  FROM documents
        |), cuts AS (
        |  SELECT doc_id, text, n,
        |    text IS NOT NULL AND hit AS fim_applied,
        |    least(a, b) AS p1, greatest(a, b) AS p2
        |  FROM d
        |)
        |SELECT doc_id, fim_applied,
        |  CASE WHEN fim_applied THEN
        |    '<fim_prefix>' || substr(text, 1, p1) ||
        |    '<fim_suffix>' || substr(text, p2 + 1, n - p2) ||
        |    '<fim_middle>' || substr(text, p1 + 1, p2 - p1)
        |  ELSE text END AS text_out
        |FROM cuts ORDER BY doc_id""".stripMargin,

    // full negative-sampling replay: word counts → top-50 → quantized
    // ^0.75 weights → cumulative [lo, hi) table → md5 draws → range-join
    // pick (the binary search's SQL twin)
    "q_neg_samples" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents
        |), f AS (
        |  SELECT word, count(*) AS freq FROM w
        |  WHERE length(word) > 0 GROUP BY word
        |), v AS (
        |  SELECT word, freq,
        |    row_number() OVER (ORDER BY freq DESC, word) AS rk
        |  FROM f QUALIFY rk <= 50
        |), wq AS (
        |  SELECT word, rk,
        |    CAST(floor(sqrt(freq * sqrt(freq)) * 1000000) AS BIGINT) AS wq
        |  FROM v
        |), cum AS (
        |  SELECT word, sum(wq) OVER (ORDER BY rk) - wq AS lo,
        |    sum(wq) OVER (ORDER BY rk) AS hi
        |  FROM wq
        |), tot AS (SELECT max(hi) AS t FROM cum),
        |draws AS (
        |  SELECT doc_id, j,
        |    CAST(md5_number_upper('neg|' || CAST(doc_id AS VARCHAR) || ':'
        |      || CAST(j AS VARCHAR)) % 72057594037927936 AS BIGINT) % t AS u
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(range(3)) AS j)
        |  CROSS JOIN tot
        |)
        |SELECT d.doc_id, d.j, c.word AS neg_word
        |FROM draws d JOIN cum c ON d.u >= c.lo AND d.u < c.hi
        |ORDER BY d.doc_id, d.j""".stripMargin,

    // positional overlapping-substring truth: count every i where
    // substr(text, i, |term|) = term — exactly the Aho–Corasick
    // dict-suffix output grain (nested lexicon terms double-count by
    // design). Lexicon duplicated literally (see keywordLexicon)
    "q_keyword_tags" ->
      """WITH lex(term, tag) AS (VALUES
        |  ('table', 'schema'), ('able', 'schema'),
        |  ('scan', 'exec'), ('can', 'exec'),
        |  ('window', 'exec'), ('win', 'exec'),
        |  ('stream', 'exec'), ('he', 'pronoun')
        |), hits AS (
        |  SELECT d.doc_id, lex.term, lex.tag,
        |    len(list_filter(range(1, length(lower(d.text)) - length(term) + 2),
        |      i -> substr(lower(d.text), i, length(term)) = term)) AS n
        |  FROM documents d CROSS JOIN lex
        |)
        |SELECT tag, term, CAST(sum(n) AS BIGINT) AS total,
        |  count(*) FILTER (n > 0) AS docs
        |FROM hits GROUP BY tag, term ORDER BY tag, term""".stripMargin,

    // full margin-mining replay: quantized cross cosines → per-side
    // top-k neighborhood sums → cross-multiplied integer margin →
    // per-source argmax + threshold. cq > 0 keeps every sum positive so
    // `//` (truncation) == floor == Spark's `div`
    "q_bitext_mine" -> bitextMarginOracle(
      "SELECT src_id, va, tgt_id, vb FROM a CROSS JOIN b"),

    // the SCALE path oracle-checked too (the q_ann_lsh discipline): the
    // 24-bit integer-Rademacher signature, its 4 × 6-bit band slices,
    // and the any-band candidate join all replay in SQL before the
    // identical margin tail — so even the approximate candidate set is
    // exact, not rows-only
    "q_bitext_banded" -> bitextMarginOracle(bitextBandedCandidates),

    // planner replay first (same cost model + tie-breaks as
    // hyperplanePlanFor), then the banded-candidate pipeline under the
    // planned grid
    "q_bitext_planned" -> bitextMarginOracle(bitextPlannedCandidates),

    // the q_ann_cosine replay plus the label-mismatch predicate
    "q_hard_negatives" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, label AS qlabel,
        |    CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id, e.label AS neg_label,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.label != q.qlabel
        |), ranked AS (
        |  SELECT query_id, id, neg_label, cosine,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, id) AS rank
        |  FROM scored
        |)
        |SELECT query_id, id, neg_label, rank, round(cosine, 6) AS cosine
        |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_bpe_encode" -> graft.queries.BpeOracle.sql,

    "q_bpe_pairs" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents
        |), f AS (
        |  SELECT word, count(*) AS freq FROM w
        |  WHERE length(word) > 0 GROUP BY word
        |), p AS (
        |  SELECT unnest(list_transform(range(1, length(word)),
        |    i -> word[i:i] || ' ' || word[i+1:i+1])) AS pair, freq
        |  FROM f WHERE length(word) >= 2
        |)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
        |FROM p GROUP BY pair ORDER BY n DESC, pair LIMIT 50""".stripMargin,

    // same tokenizer twin as bm25Oracle; list-slice == top-k heads
    // replays the md5(doc:pos) subsampling draw, the per-doc compaction
    // rank, and the ±2 rank-distance pairing; counts are exact integers
    "q_skipgram_pairs" ->
      """WITH tk AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS t
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, u.p AS pos, u.w AS word
        |  FROM (SELECT doc_id, unnest(list_transform(range(0, len(t)),
        |    i -> struct_pack(p := i, w := t[i + 1]))) AS u FROM tk)
        |), vocab AS (
        |  SELECT word, CAST(count(*) AS BIGINT) AS n_w FROM p GROUP BY 1
        |), nt AS (
        |  SELECT CAST(sum(n_w) AS BIGINT) AS n_tok FROM vocab
        |), kept AS (
        |  SELECT doc_id, word,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rk
        |  FROM p JOIN vocab USING (word)
        |  WHERE n_w >= 5
        |    AND CAST(md5_number_upper(CAST(doc_id AS VARCHAR) || ':' ||
        |        CAST(pos AS VARCHAR)) % 72057594037927936 AS BIGINT)
        |      % 1000000
        |      < least(1000000, CAST(floor(sqrt(
        |          0.001 * CAST((SELECT n_tok FROM nt) AS DOUBLE)
        |            / CAST(n_w AS DOUBLE)) * 1000000) AS BIGINT))
        |)
        |SELECT a.word AS w_center, b.word AS w_context,
        |  CAST(count(*) AS BIGINT) AS n_pairs
        |FROM kept a JOIN kept b ON a.doc_id = b.doc_id
        |  AND b.rk BETWEEN a.rk - 2 AND a.rk + 2 AND b.rk <> a.rk
        |GROUP BY 1, 2
        |ORDER BY w_center, w_context""".stripMargin,

    // phrase truth via positional self-joins (adjacency chains) — the
    // simplest possible SQL statement of "consecutive tokens"
    "q_phrase_search" ->
      """WITH docs AS (
        |  SELECT doc_id, CASE WHEN doc_id % 5 = 0
        |    THEN text || ' alpha beta gamma alpha beta gamma'
        |    ELSE text END AS text
        |  FROM documents
        |), p AS (
        |  SELECT doc_id, u.p AS pos, u.w AS term
        |  FROM (SELECT doc_id, unnest(list_transform(range(0, len(t)),
        |      i -> struct_pack(p := i, w := t[i + 1]))) AS u
        |    FROM (SELECT doc_id, string_split(regexp_replace(
        |      lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t FROM docs))
        |), hits AS (
        |  SELECT 'alpha beta gamma' AS phrase, a.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM p a
        |  JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  WHERE a.term = 'alpha' AND b.term = 'beta' AND c.term = 'gamma'
        |  GROUP BY a.doc_id
        |  UNION ALL
        |  SELECT 'beta gamma alpha' AS phrase, a.doc_id,
        |    CAST(count(*) AS BIGINT) AS n_occurrences
        |  FROM p a
        |  JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |  JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |  WHERE a.term = 'beta' AND b.term = 'gamma' AND c.term = 'alpha'
        |  GROUP BY a.doc_id
        |)
        |SELECT phrase, doc_id, n_occurrences FROM hits
        |ORDER BY phrase, doc_id""".stripMargin,

    "q_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
        |    AS term
        |  FROM documents
        |), tf AS (
        |  SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2
        |)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  CAST(sum(tf) AS BIGINT) AS tf_total,
        |  array_to_string((list(doc_id ORDER BY doc_id))[1:10], ',')
        |    AS postings_head
        |FROM tf GROUP BY term ORDER BY term""".stripMargin,

    // same fixture, same block/verify pipeline in SQL
    "q_fuzzy_pairs" ->
      """WITH base AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS rec_id,
        |    md5(CAST(c_custkey AS VARCHAR)) AS name
        |  FROM customer
        |), all_recs AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT rec_id + 1000000, substr(name, 1, 31)
        |  FROM base WHERE rec_id % 7 = 0
        |  UNION ALL
        |  SELECT rec_id + 2000000, substr(name, 1, 30) || 'zz'
        |  FROM base WHERE rec_id % 13 = 0
        |), sides AS (
        |  SELECT rec_id, name, lower(substr(name, 1, 4)) AS blk,
        |    length(name) AS len
        |  FROM all_recs
        |)
        |SELECT a.rec_id AS id_a, b.rec_id AS id_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM sides a JOIN sides b ON a.blk = b.blk
        |WHERE a.rec_id < b.rec_id AND abs(a.len - b.len) <= 2
        |  AND levenshtein(a.name, b.name) <= 2
        |ORDER BY id_a, id_b""".stripMargin,

    // full HLL replay: 2^45-scaled exact-integer registers, one shared
    // double literal for α·m²·2^45, identical estimator trees
    "q_hll_distinct" ->
      """WITH keys AS (
        |  SELECT 'words' AS scope,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS k
        |  FROM documents
        |  UNION ALL
        |  SELECT 'source' AS scope, source AS k FROM documents
        |  UNION ALL
        |  SELECT 'lineitem' AS scope,
        |    CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS k
        |  FROM lineitem
        |), h AS (
        |  SELECT scope,
        |    CAST(md5_number_upper(k) % 72057594037927936 AS BIGINT) AS h
        |  FROM keys
        |), regs AS (
        |  SELECT scope, h // 17592186044416 AS bucket,
        |    min(CASE WHEN h % 17592186044416 = 0 THEN 0
        |      ELSE length(bin(h % 17592186044416)) END) AS min_len
        |  FROM h GROUP BY scope, bucket
        |), agg AS (
        |  SELECT scope, CAST(count(*) AS BIGINT) AS n_present,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(min_len AS INT))
        |        AS BIGINT)
        |      + (4096 - CAST(count(*) AS BIGINT)) * 35184372088832
        |      AS s_scaled
        |  FROM regs GROUP BY scope
        |)
        |SELECT scope, n_present, s_scaled,
        |  CAST(floor(4.2566823519294213e20 / CAST(s_scaled AS DOUBLE))
        |    AS BIGINT) AS est_raw_q,
        |  CAST(floor(CASE
        |    WHEN 4.2566823519294213e20 / CAST(s_scaled AS DOUBLE)
        |        <= 10240.0 AND n_present < 4096
        |      THEN 4096.0 * ln(4096.0 /
        |        CAST(4096 - n_present AS DOUBLE))
        |    ELSE 4.2566823519294213e20 / CAST(s_scaled AS DOUBLE)
        |  END) AS BIGINT) AS est_q
        |FROM agg ORDER BY scope""".stripMargin,

    "q_hll_groups" ->
      """WITH keys AS (
        |  SELECT source,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS k
        |  FROM documents
        |), h AS (
        |  SELECT source,
        |    CAST(md5_number_upper(k) % 72057594037927936 AS BIGINT) AS h
        |  FROM keys
        |), regs AS (
        |  SELECT source, h // 17592186044416 AS bucket,
        |    min(CASE WHEN h % 17592186044416 = 0 THEN 0
        |      ELSE length(bin(h % 17592186044416)) END) AS min_len
        |  FROM h GROUP BY source, bucket
        |), agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_present,
        |    CAST(sum(CAST(1 AS BIGINT) << CAST(min_len AS INT))
        |        AS BIGINT)
        |      + (4096 - CAST(count(*) AS BIGINT)) * 35184372088832
        |      AS s_scaled
        |  FROM regs GROUP BY source
        |)
        |SELECT source, n_present, s_scaled,
        |  CAST(floor(4.2566823519294213e20 / CAST(s_scaled AS DOUBLE))
        |    AS BIGINT) AS est_raw_q,
        |  CAST(floor(CASE
        |    WHEN 4.2566823519294213e20 / CAST(s_scaled AS DOUBLE)
        |        <= 10240.0 AND n_present < 4096
        |      THEN 4096.0 * ln(4096.0 /
        |        CAST(4096 - n_present AS DOUBLE))
        |    ELSE 4.2566823519294213e20 / CAST(s_scaled AS DOUBLE)
        |  END) AS BIGINT) AS est_q
        |FROM agg ORDER BY source""".stripMargin,

    "q_rrf_fusion" ->
      """WITH words AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(list_distinct(
        |      string_split_regex(lower(trim(text)), '\s+'))) AS w
        |    FROM documents)
        |  WHERE length(w) > 0
        |), qw AS (
        |  SELECT doc_id AS query_id, w FROM words WHERE doc_id < 5
        |), lex0 AS (
        |  SELECT qw.query_id, words.doc_id AS id,
        |    CAST(count(*) AS BIGINT) AS j
        |  FROM words JOIN qw USING (w)
        |  WHERE words.doc_id != qw.query_id
        |  GROUP BY 1, 2
        |), lexk AS (
        |  SELECT query_id, id, rank FROM (
        |    SELECT query_id, id, row_number() OVER (PARTITION BY query_id
        |      ORDER BY j DESC, id) AS rank
        |    FROM lex0)
        |  WHERE rank <= 10
        |), q AS (
        |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
        |  FROM embeddings WHERE vec_id < 5
        |), scored AS (
        |  SELECT q.query_id, e.vec_id AS id,
        |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
        |      AS cosine
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id != q.query_id
        |), semk AS (
        |  SELECT query_id, id, rank FROM (
        |    SELECT query_id, id, row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, id) AS rank
        |    FROM scored)
        |  WHERE rank <= 10
        |), uni AS (
        |  SELECT query_id, id, 1000000000 // (60 + rank) AS c FROM lexk
        |  UNION ALL
        |  SELECT query_id, id, 1000000000 // (60 + rank) AS c FROM semk
        |), fused AS (
        |  SELECT query_id, id, CAST(sum(c) AS BIGINT) AS rrf_score_ppb,
        |    CAST(count(*) AS BIGINT) AS n_lists
        |  FROM uni GROUP BY 1, 2
        |)
        |SELECT query_id, id, rrf_score_ppb, n_lists, fused_rank FROM (
        |  SELECT query_id, id, rrf_score_ppb, n_lists,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY rrf_score_ppb DESC, id) AS fused_rank
        |  FROM fused)
        |WHERE fused_rank <= 10
        |ORDER BY query_id, fused_rank""".stripMargin,

    // op-for-op replay of unigramDivergence: same smoothing quotients,
    // same ln trees, same 1e9 floor-quantized contributions
    "q_kl_divergence" ->
      """WITH c AS MATERIALIZED (
        |  SELECT slice, word, CAST(count(*) AS BIGINT) AS n_sw FROM (
        |    SELECT source AS slice,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |    FROM documents
        |  ) WHERE length(word) > 0 GROUP BY 1, 2
        |), v AS MATERIALIZED (
        |  SELECT word, CAST(sum(n_sw) AS BIGINT) AS n_w FROM c GROUP BY 1
        |), t AS MATERIALIZED (
        |  SELECT slice, CAST(sum(n_sw) AS BIGINT) AS n_s FROM c GROUP BY 1
        |), sc AS (
        |  SELECT CAST(sum(n_w) AS BIGINT) AS n_tok,
        |    CAST(count(*) AS BIGINT) AS vv FROM v
        |), grid AS (
        |  SELECT t.slice, t.n_s, v.n_w,
        |    coalesce(c.n_sw, 0) + 1 AS cp, t.n_s + sc.vv AS np,
        |    v.n_w - coalesce(c.n_sw, 0) + 1 AS cq,
        |    sc.n_tok - t.n_s + sc.vv AS nq
        |  FROM v CROSS JOIN t CROSS JOIN sc
        |  LEFT JOIN c ON c.slice = t.slice AND c.word = v.word
        |), contrib AS (
        |  SELECT slice, n_s,
        |    CAST(floor(CAST(cp AS DOUBLE) / np
        |      * ln((CAST(cp AS DOUBLE) / np) / (CAST(cq AS DOUBLE) / nq))
        |      * 1e9) AS BIGINT) AS kl_c,
        |    CAST(floor(-(CAST(cp AS DOUBLE) / np)
        |      * ln(CAST(cq AS DOUBLE) / nq) * 1e9) AS BIGINT) AS ce_c
        |  FROM grid
        |)
        |SELECT slice, min(n_s) AS n_tokens,
        |  CAST(sum(kl_c) AS BIGINT) AS kl_q9,
        |  CAST(sum(ce_c) AS BIGINT) AS ce_q9,
        |  CAST(sum(kl_c) AS DOUBLE) / 1e9 AS kl,
        |  CAST(sum(ce_c) AS DOUBLE) / 1e9 AS cross_entropy
        |FROM contrib GROUP BY slice ORDER BY slice""".stripMargin,

    // full CMS replay: same depth-salted md5 addressing, integer sums,
    // min-over-depths probe — every column exact cross-engine
    "q_cms" ->
      """WITH w AS MATERIALIZED (
        |  SELECT k, CAST(count(*) AS BIGINT) AS exact_n FROM (
        |    SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
        |      AS k FROM documents
        |  ) WHERE length(k) > 0 GROUP BY k
        |), hh AS MATERIALIZED (
        |  SELECT k, exact_n, CAST(d.range AS INT) AS depth,
        |    CAST(md5_number_upper(CAST(d.range AS VARCHAR) || '|' || k)
        |      % 72057594037927936 AS BIGINT) % 1024 AS bucket
        |  FROM w CROSS JOIN range(4) d
        |), regs AS (
        |  SELECT depth, bucket, CAST(sum(exact_n) AS BIGINT) AS n
        |  FROM hh GROUP BY 1, 2
        |)
        |SELECT hh.k AS word, CAST(min(hh.exact_n) AS BIGINT) AS exact_n,
        |  CAST(min(r.n) AS BIGINT) AS est_n
        |FROM hh JOIN regs r USING (depth, bucket)
        |WHERE hh.exact_n >= 50
        |GROUP BY hh.k ORDER BY word""".stripMargin,

    // exact-integer log2 buckets via binary digit count, both engines
    "q_token_histogram" ->
      """WITH t AS (
        |  SELECT CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |  END AS n FROM documents
        |)
        |SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS total_tokens,
        |  CAST(min(n) AS BIGINT) AS min_tokens,
        |  CAST(max(n) AS BIGINT) AS max_tokens
        |FROM t WHERE n > 0 GROUP BY 1 ORDER BY bucket""".stripMargin,

    // integer-exact replay of epochPlan: same ppm weights, same DIV tree
    "q_epoch_plan" ->
      """WITH t AS (
        |  SELECT source, CASE WHEN length(trim(text)) = 0 THEN 0
        |    ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |  END AS n FROM documents
        |), stats AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS tokens_avail
        |  FROM t GROUP BY source
        |), tot AS (
        |  SELECT CAST(sum(tokens_avail) AS BIGINT) AS tot FROM stats
        |), w(source, w_ppm) AS (VALUES
        |  ('src0', CAST(400000 AS BIGINT)), ('src1', CAST(250000 AS BIGINT)),
        |  ('src2', CAST(150000 AS BIGINT)), ('src3', CAST(120000 AS BIGINT)),
        |  ('src4', CAST(80000 AS BIGINT))
        |)
        |SELECT s.source, s.n_docs, s.tokens_avail,
        |  s.tokens_avail * 1000000 // tot.tot AS avail_share_ppm,
        |  10000000 * w.w_ppm // 1000000 AS target_tokens,
        |  (10000000 * w.w_ppm // 1000000) * 1000000 // s.tokens_avail
        |    AS epochs_ppm
        |FROM stats s JOIN w USING (source), tot
        |ORDER BY source""".stripMargin,

    "q_vocab_stats" ->
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |  FROM documents
        |), f AS (
        |  SELECT word, count(*) AS freq FROM w
        |  WHERE length(word) > 0 GROUP BY word
        |), tot AS (
        |  SELECT CAST(sum(freq) AS DOUBLE) AS total FROM f
        |), top AS (
        |  SELECT word, freq FROM f ORDER BY freq DESC, word LIMIT 30
        |)
        |SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) AS INTEGER)
        |    AS rank,
        |  word, CAST(freq AS BIGINT) AS freq,
        |  floor(CAST(sum(freq) OVER (ORDER BY freq DESC, word
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    * 1000000 / total) / 1000000 AS cum_frac
        |FROM top CROSS JOIN tot
        |ORDER BY rank""".stripMargin,

    "q_pmi_bigrams" ->
      """WITH t AS (
        |  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS tk
        |  FROM documents
        |), u AS (
        |  SELECT word, count(*) AS n_w
        |  FROM (SELECT unnest(tk) AS word FROM t) GROUP BY word
        |), ntok AS (
        |  SELECT CAST(sum(n_w) AS DOUBLE) AS n_tok FROM u
        |), b AS (
        |  SELECT p['w_a'] AS w_a, p['w_b'] AS w_b, count(*) AS n_ab
        |  FROM (
        |    SELECT unnest(list_transform(range(1, len(tk)),
        |      i -> struct_pack(w_a := tk[i], w_b := tk[i+1]))) AS p
        |    FROM t WHERE len(tk) >= 2)
        |  GROUP BY 1, 2
        |), nbig AS (
        |  SELECT CAST(sum(n_ab) AS DOUBLE) AS n_big FROM b
        |)
        |SELECT w_a, w_b, CAST(n_ab AS BIGINT) AS n_ab,
        |  CAST(floor(ln(
        |    (CAST(n_ab AS DOUBLE) / n_big) /
        |    ((CAST(ua.n_w AS DOUBLE) / n_tok) *
        |     (CAST(ub.n_w AS DOUBLE) / n_tok)))
        |    * 1000000) AS BIGINT) AS pmi_q6
        |FROM b
        |JOIN u ua ON ua.word = b.w_a
        |JOIN u ub ON ub.word = b.w_b
        |CROSS JOIN ntok CROSS JOIN nbig
        |WHERE n_ab >= 5
        |ORDER BY w_a, w_b""".stripMargin,

    // exact replay of Winnow.fingerprints(k=8, w=10, md5Long56):
    // md5_number_upper % 2^56 IS md5Long56 (first 7 digest bytes,
    // little-endian — the Hashing.md5Long56 contract)
    "q_winnow" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
        |  FROM documents
        |), h AS (
        |  SELECT doc_id, list_transform(range(1, length(t) - 6),
        |    i -> CAST(md5_number_upper(t[i:i+7]) % 72057594037927936
        |      AS BIGINT)) AS hs
        |  FROM d WHERE length(t) >= 17
        |)
        |SELECT doc_id,
        |  unnest(list_distinct(list_transform(range(0, len(hs) - 9),
        |    j -> list_min(hs[j+1:j+10])))) AS fp
        |FROM h
        |ORDER BY doc_id, fp""".stripMargin,

    "q_stratified_sample" ->
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY CAST(md5_number_upper('sample|' ||
        |          CAST(doc_id AS VARCHAR)) % 72057594037927936 AS BIGINT),
        |        doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 20 ORDER BY doc_id""".stripMargin,

    // replays the salted draw, the per-source running token sum in draw
    // order, and the inclusive-cumsum budget cut
    "q_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE CAST(len(string_split_regex(trim(text), '\s+'))
        |        AS BIGINT) END AS n_tokens,
        |    CAST(md5_number_upper('tb|' || CAST(doc_id AS VARCHAR))
        |      % 72057594037927936 AS BIGINT) AS draw
        |  FROM documents
        |), c AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY draw, doc_id ROWS UNBOUNDED PRECEDING)
        |      AS BIGINT) AS cum_tokens
        |  FROM t
        |)
        |SELECT doc_id, source, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 800 ORDER BY doc_id""".stripMargin,

    // integer `//` replay of packEfficiency's div tree; the efficiency
    // ratios are single divisions of exact integers
    "q_pack_efficiency" ->
      """WITH t AS (
        |  SELECT source,
        |    CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE CAST(len(string_split_regex(trim(text), '\s+'))
        |        AS BIGINT) END AS n
        |  FROM documents
        |), g AS (
        |  SELECT source,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n) AS BIGINT) AS total_tokens,
        |    CAST(sum((n + 63) // 64) AS BIGINT) AS padded_examples
        |  FROM t WHERE n > 0 GROUP BY source
        |)
        |SELECT source, n_docs, total_tokens, padded_examples,
        |  CAST((total_tokens + 63) // 64 AS BIGINT) AS packed_examples,
        |  CAST(padded_examples * 64 - total_tokens AS BIGINT)
        |    AS pad_waste_tokens,
        |  CAST(total_tokens AS DOUBLE) / (padded_examples * 64)
        |    AS padded_efficiency,
        |  CAST(total_tokens AS DOUBLE) / (((total_tokens + 63) // 64) * 64)
        |    AS packed_efficiency
        |FROM g ORDER BY source""".stripMargin,

    "q_unigram_logprob" ->
      """WITH ww AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id,
        |      unnest(string_split_regex(lower(trim(text)), '\s+')) AS word
        |    FROM documents)
        |  WHERE length(word) > 0
        |), u AS (
        |  SELECT word, count(*) AS n_w FROM ww GROUP BY word
        |), ntok AS (
        |  SELECT CAST(sum(n_w) AS DOUBLE) AS n_tok FROM u
        |), c AS (
        |  SELECT doc_id,
        |    CAST(floor(ln(CAST(n_w AS DOUBLE) / n_tok) * 1000000)
        |      AS BIGINT) AS cq
        |  FROM ww JOIN u USING (word) CROSS JOIN ntok
        |)
        |SELECT doc_id, CAST(sum(cq) AS BIGINT) AS sum_q6,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(cq) AS DOUBLE) / (count(*) * 1000000) AS avg_logprob
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_bigram_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS tk
        |  FROM documents
        |), db AS (
        |  SELECT doc_id, p['w_a'] AS w_a, p['w_b'] AS w_b
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |      i -> struct_pack(w_a := tk[i], w_b := tk[i+1]))) AS p
        |    FROM t WHERE len(tk) >= 2)
        |), u AS (
        |  SELECT w_a, count(*) AS n_a
        |  FROM (SELECT unnest(tk) AS w_a FROM t) GROUP BY w_a
        |), v AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS vs FROM u
        |), b AS (
        |  SELECT w_a, w_b, count(*) AS n_ab FROM db GROUP BY w_a, w_b
        |), c AS (
        |  SELECT doc_id,
        |    CAST(floor(ln((CAST(n_ab AS DOUBLE) + 1.0) /
        |        (CAST(n_a AS DOUBLE) + vs)) * 1000000) AS BIGINT) AS cq
        |  FROM db
        |  JOIN b USING (w_a, w_b)
        |  JOIN u USING (w_a)
        |  CROSS JOIN v
        |)
        |SELECT doc_id, CAST(sum(cq) AS BIGINT) AS sum_q6,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cq) AS DOUBLE) / (count(*) * 1000000) AS avg_logprob
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Kneser-Ney: context stats c(a·)/N1+(a,·), continuation types
    // N1+(·,b) and the type total all derive from the bigram count table;
    // the P_KN arithmetic tree mirrors CorpusStats.knLogProb op-for-op
    "q_kn_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS tk
        |  FROM documents
        |), db AS (
        |  SELECT doc_id, p['w_a'] AS w_a, p['w_b'] AS w_b
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(tk)),
        |      i -> struct_pack(w_a := tk[i], w_b := tk[i+1]))) AS p
        |    FROM t WHERE len(tk) >= 2)
        |), b AS (
        |  SELECT w_a, w_b, count(*) AS n_ab FROM db GROUP BY w_a, w_b
        |), ctx AS (
        |  SELECT w_a, CAST(sum(n_ab) AS BIGINT) AS c_a,
        |    count(*) AS n1p_a
        |  FROM b GROUP BY w_a
        |), cont AS (
        |  SELECT w_b, count(*) AS t_b FROM b GROUP BY w_b
        |), ty AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS t_all FROM b
        |), c AS (
        |  SELECT doc_id,
        |    CAST(floor(ln(
        |      greatest(CAST(n_ab AS DOUBLE) - 0.75, 0.0) /
        |        CAST(c_a AS DOUBLE) +
        |      (0.75 * CAST(n1p_a AS DOUBLE) / CAST(c_a AS DOUBLE)) *
        |        (CAST(t_b AS DOUBLE) / t_all)) * 1000000) AS BIGINT) AS cq
        |  FROM db
        |  JOIN b USING (w_a, w_b)
        |  JOIN ctx USING (w_a)
        |  JOIN cont USING (w_b)
        |  CROSS JOIN ty
        |)
        |SELECT doc_id, CAST(sum(cq) AS BIGINT) AS sum_q6,
        |  CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(cq) AS DOUBLE) / (count(*) * 1000000) AS avg_logprob
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // dt/tri/cont2 are MATERIALIZED: DuckDB inlines plain CTEs, and with
    // the scalar CROSS JOIN present the re-expanded 4-deep chain makes
    // the optimizer blow up (observed: 70 GB / >10 min at sf0.01;
    // materialized: 0.5 s)
    // the round trip is the identity on the normalized corpus — the
    // oracle is just that normalization, so ANY encode/decode defect
    // (lost subword, wrong order, wrong id, eow damage) hash-fails
    "q_bpe_roundtrip" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0), ' ') AS text
        |FROM documents
        |WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |  x -> length(x) > 0)) > 0
        |ORDER BY doc_id""".stripMargin,

    "q_kn3_logprob" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0) AS tk
        |  FROM documents
        |), dt AS MATERIALIZED (
        |  SELECT doc_id, p['w_a'] AS w_a, p['w_b'] AS w_b, p['w_c'] AS w_c
        |  FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
        |      i -> struct_pack(w_a := tk[i], w_b := tk[i+1],
        |        w_c := tk[i+2]))) AS p
        |    FROM t WHERE len(tk) >= 3)
        |), tri AS MATERIALIZED (
        |  SELECT w_a, w_b, w_c, count(*) AS n_abc
        |  FROM dt GROUP BY w_a, w_b, w_c
        |), ctx2 AS (
        |  SELECT w_a, w_b, CAST(sum(n_abc) AS BIGINT) AS c_ab,
        |    count(*) AS n1p_ab
        |  FROM tri GROUP BY w_a, w_b
        |), cont2 AS MATERIALIZED (
        |  SELECT w_b, w_c, count(*) AS n1p_bc FROM tri GROUP BY w_b, w_c
        |), ctx1 AS (
        |  SELECT w_b, CAST(sum(n1p_bc) AS BIGINT) AS tot_b,
        |    count(*) AS typ_b
        |  FROM cont2 GROUP BY w_b
        |), cont1 AS (
        |  SELECT w_c, count(*) AS n1p_c FROM cont2 GROUP BY w_c
        |), ty AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS t_all FROM cont2
        |), c AS (
        |  SELECT doc_id,
        |    CAST(floor(ln(
        |      greatest(CAST(n_abc AS DOUBLE) - 0.75, 0.0) /
        |        CAST(c_ab AS DOUBLE) +
        |      (0.75 * CAST(n1p_ab AS DOUBLE) / CAST(c_ab AS DOUBLE)) *
        |        (greatest(CAST(n1p_bc AS DOUBLE) - 0.75, 0.0) /
        |          CAST(tot_b AS DOUBLE) +
        |         (0.75 * CAST(typ_b AS DOUBLE) / CAST(tot_b AS DOUBLE)) *
        |           (CAST(n1p_c AS DOUBLE) / t_all))) * 1000000)
        |      AS BIGINT) AS cq
        |  FROM dt
        |  JOIN tri USING (w_a, w_b, w_c)
        |  JOIN ctx2 USING (w_a, w_b)
        |  JOIN cont2 USING (w_b, w_c)
        |  JOIN ctx1 USING (w_b)
        |  JOIN cont1 USING (w_c)
        |  CROSS JOIN ty
        |)
        |SELECT doc_id, CAST(sum(cq) AS BIGINT) AS sum_q6,
        |  CAST(count(*) AS BIGINT) AS n_trigrams,
        |  CAST(sum(cq) AS DOUBLE) / (count(*) * 1000000) AS avg_logprob
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // built on the shared kn5OracleCore (see above)
    "q_kn5_logprob" -> (kn5OracleCore +
      """
        |SELECT doc_id, sum_q6, n_grams, avg_logprob
        |FROM scored ORDER BY doc_id""".stripMargin),

    // CCNet perplexity bands: bounds are NEAREST-RANK order statistics
    // of a bounded md5-draw sample (no interpolation to mirror across
    // engines — integer comparisons cannot flip on a ulp); the rank-k
    // VALUE is tie-stable so no tiebreak is needed
    "q_ccnet_bands" -> (kn5OracleCore +
      """, sq AS MATERIALIZED (
        |  SELECT doc_id,
        |    CAST(floor(avg_logprob * 1000000) AS BIGINT) AS avg_q6
        |  FROM scored
        |), sample AS MATERIALIZED (
        |  SELECT doc_id, avg_q6 FROM sq
        |  ORDER BY CAST(md5_number_upper('ppl|' ||
        |      CAST(doc_id AS VARCHAR)) % 72057594037927936 AS BIGINT),
        |    doc_id
        |  LIMIT 50000
        |), ranked AS (
        |  SELECT avg_q6, row_number() OVER (ORDER BY avg_q6 DESC) AS rk
        |  FROM sample
        |), nn AS (
        |  SELECT count(*) AS n FROM sample
        |), bounds AS (
        |  SELECT
        |    max(CASE WHEN rk = greatest(CAST(ceil(n / 3.0) AS BIGINT), 1)
        |      THEN avg_q6 END) AS b_head,
        |    max(CASE WHEN rk =
        |        greatest(CAST(ceil(n * 2.0 / 3.0) AS BIGINT), 1)
        |      THEN avg_q6 END) AS b_mid
        |  FROM ranked CROSS JOIN nn
        |)
        |SELECT doc_id, avg_q6,
        |  CASE WHEN avg_q6 >= b_head THEN 'head'
        |       WHEN avg_q6 >= b_mid THEN 'middle'
        |       ELSE 'tail' END AS band
        |FROM sq CROSS JOIN bounds ORDER BY doc_id""".stripMargin),

    // groups by the sorted token STRING itself — proves the Spark plan's
    // md5 bag key loses nothing
    "q_bow_dedup" ->
      """WITH docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 300000,
        |    array_to_string(list_sort(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0)), ' ')
        |  FROM documents WHERE doc_id % 9 = 0
        |), k AS (
        |  SELECT doc_id,
        |    array_to_string(list_sort(list_filter(
        |      string_split_regex(lower(trim(text)), '\s+'),
        |      x -> length(x) > 0)), ' ') AS bow
        |  FROM docs
        |)
        |SELECT min(doc_id) AS canonical_id,
        |  CAST(count(*) AS BIGINT) AS n_bow_dups
        |FROM k GROUP BY bow HAVING count(*) > 1
        |ORDER BY canonical_id""".stripMargin,

    "q_contiguous_ids" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
        |    AS seq_id
        |FROM documents ORDER BY doc_id""".stripMargin,

    // replays pageText + the C4 line/page rules verbatim over the same
    // synthetic page structure. (Concatenation, not interpolation into a
    // margin string: the CTE's '||' continuations would be eaten by the
    // outer stripMargin.)
    "q_c4_clean" ->
      (s"WITH ${pageCte("documents", "doc_id")},\n" +
      """sp AS (
         |  SELECT doc_id, page, string_split(page, chr(10)) AS lines
         |  FROM pages
         |), k AS (
         |  SELECT doc_id, page, lines,
         |    list_filter(lines, l ->
         |      (l LIKE '%.' OR l LIKE '%!' OR l LIKE '%?' OR l LIKE '%"')
         |      AND len(list_filter(string_split_regex(trim(l), '\s+'),
         |            w -> length(w) > 0)) >= 3
         |      AND NOT contains(lower(l), 'javascript')) AS kept
         |  FROM sp
         |)
         |SELECT doc_id,
         |  CAST(len(lines) AS BIGINT) AS n_lines,
         |  CAST(len(kept) AS BIGINT) AS n_kept_lines,
         |  (len(kept) >= 5 AND NOT contains(lower(page), 'lorem ipsum')
         |     AND NOT contains(page, '{')
         |     AND NOT contains(page, '}')) AS page_kept,
         |  CASE WHEN len(kept) >= 5
         |        AND NOT contains(lower(page), 'lorem ipsum')
         |        AND NOT contains(page, '{')
         |        AND NOT contains(page, '}')
         |       THEN array_to_string(kept, chr(10)) ELSE '' END
         |    AS cleaned_text
         |FROM k ORDER BY doc_id""".stripMargin),

    "q_train_examples" -> graft.queries.BpeOracle.exampleSql,

    // replays temperatureSample's integer-quantized weight, the exact
    // rate expression tree, and the 2^56 hash-space decision
    "q_mixture_temperature" ->
      """WITH skewed AS (
        |  SELECT doc_id,
        |    CASE WHEN source IN ('src0', 'src1') THEN source
        |         ELSE 'src_major' END AS source
        |  FROM documents
        |), stats AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n
        |  FROM skewed GROUP BY source
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_total FROM stats
        |), sg AS (
        |  SELECT source, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE) / n_total) * 1e9) AS BIGINT)
        |      AS s
        |  FROM stats, tot
        |), ss AS (
        |  SELECT CAST(sum(s) AS BIGINT) AS s_total FROM sg
        |), th AS (
        |  SELECT source,
        |    CAST(floor(least(1.0,
        |      0.5 * CAST(n_total AS DOUBLE) * CAST(s AS DOUBLE) /
        |        (CAST(s_total AS DOUBLE) * CAST(n AS DOUBLE)))
        |      * 72057594037927936.0) AS BIGINT) AS keep_thresh
        |  FROM sg, tot, ss
        |)
        |SELECT d.doc_id, d.source, t.keep_thresh
        |FROM skewed d JOIN th t USING (source)
        |WHERE CAST(md5_number_upper('temp|' || CAST(d.doc_id AS VARCHAR))
        |    % 72057594037927936 AS BIGINT) < t.keep_thresh
        |ORDER BY d.doc_id""".stripMargin,

    // the oracle IS the global row_number over the same salted draw —
    // the distributed zipWithIndex plan must meet its contract
    "q_corpus_shuffle" ->
      """SELECT doc_id, source,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('epoch0-' || CAST(doc_id AS VARCHAR)), doc_id)
        |    - 1 AS BIGINT) AS shuffle_pos
        |FROM documents ORDER BY doc_id""".stripMargin,

    // replays the marked-word substring explode + the (w × len, piece)
    // total-order cut of UnigramLm.seedVocab
    "q_sp_vocab" ->
      """WITH wf AS (
        |  SELECT '▁' || word AS word, count(*) AS freq
        |  FROM (SELECT unnest(list_filter(
        |          string_split_regex(lower(trim(text)), '\s+'),
        |          x -> length(x) > 0)) AS word FROM documents)
        |  GROUP BY 1
        |), subs AS (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS w
        |  FROM (
        |    SELECT freq, unnest(flatten(list_transform(
        |      range(1, length(word) + 1),
        |      i -> list_transform(
        |        range(1, least(4, length(word) - i + 1) + 1),
        |        l -> substr(word, CAST(i AS INTEGER), CAST(l AS INTEGER))))))
        |      AS piece
        |    FROM wf)
        |  GROUP BY piece
        |), multi AS (
        |  SELECT piece, w, false AS is_char FROM subs
        |  WHERE length(piece) >= 2
        |  ORDER BY w * length(piece) DESC, piece LIMIT 200
        |)
        |SELECT piece, w, is_char FROM
        |  (SELECT piece, w, true AS is_char FROM subs
        |   WHERE length(piece) = 1
        |   UNION ALL SELECT * FROM multi)
        |ORDER BY piece""".stripMargin,

    // the round trip's fixed point IS the normalized corpus (the
    // q_bpe_roundtrip oracle, second tokenizer family)
    "q_sp_roundtrip" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(
        |    string_split_regex(lower(trim(text)), '\s+'),
        |    x -> length(x) > 0), ' ') AS text
        |FROM documents
        |WHERE len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
        |  x -> length(x) > 0)) > 0
        |ORDER BY doc_id""".stripMargin,

    // replays the seed pick, the exact-integer nearest-centroid
    // assignment (ties to the lowest cluster — kmeansAssignCtes, the
    // SAME prefix q_kmeans_iter replays), and the salted stratified
    // draw
    // cluster-scoped semantic dedup: assignment + pairs + closure +
    // keep pick all replayed (see semDedupOracle)
    "q_semdedup" -> semDedupOracle,
    // 2-probe pair domain (rn <= 2) + smallest-shared-cell dedup;
    // components and keep pick replay on the 1-nearest assignment
    "q_semdedup_probe2" -> semDedupOracleFor(8, probeCells = 2),
    "q_semdedup_planned" -> semDedupPlannedOracle,
    "q_semdedup_probe2_planned" -> semDedupProbe2PlannedOracle,

    "q_cluster_balance" -> (kmeansAssignCtes +
      """, r AS (
        |  SELECT vec_id, cluster_id,
        |    row_number() OVER (PARTITION BY cluster_id
        |      ORDER BY CAST(md5_number_upper('cbal|' ||
        |          CAST(vec_id AS VARCHAR)) % 72057594037927936 AS BIGINT),
        |        vec_id) AS rk
        |  FROM a WHERE rn = 1
        |)
        |SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster
        |FROM r WHERE rk <= 20 ORDER BY cluster, vec_id""".stripMargin),

    // replays KMeans' quantize → md5-draw init → integer-distance
    // assignment (kmeansAssignCtes) → floor(sum/count) update, one
    // full Lloyd step
    "q_kmeans_iter" -> (kmeansAssignCtes +
      """, upd AS (
        |  SELECT cluster_id, CAST(j - 1 AS BIGINT) AS dim_idx,
        |    CAST(count(*) AS BIGINT) AS n_assigned,
        |    CAST(floor(sum(q[j]) * 1.0 / count(*)) AS BIGINT) AS centroid_q
        |  FROM a, (SELECT unnest(range(1, 65)) AS j) dims
        |  WHERE rn = 1
        |  GROUP BY cluster_id, j
        |)
        |SELECT i.cluster_id,
        |  CAST(coalesce(u.n_assigned, 0) AS BIGINT) AS n_assigned,
        |  dd.dim_idx,
        |  coalesce(u.centroid_q, i.q[CAST(dd.dim_idx + 1 AS BIGINT)])
        |    AS centroid_q
        |FROM init i
        |CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS BIGINT)
        |            AS dim_idx) dd
        |LEFT JOIN upd u ON u.cluster_id = i.cluster_id
        |  AND u.dim_idx = dd.dim_idx
        |ORDER BY i.cluster_id, dd.dim_idx""".stripMargin),

    // the keep-first argmin keyed by line TEXT (the Spark plan keys by
    // xxhash64 — this check proves the hashed plan lossless)
    "q_para_dedup" ->
      (s"$docsWithDupsCte,\n${pageCte("docs", "(doc_id % 100000)")},\n" +
      """l AS (
         |  SELECT doc_id, generate_subscripts(lns, 1) - 1 AS idx,
         |    unnest(lns) AS line
         |  FROM (SELECT doc_id, string_split(page, chr(10)) AS lns
         |        FROM pages)
         |), r AS (
         |  SELECT doc_id, idx, line,
         |    row_number() OVER (PARTITION BY line ORDER BY doc_id, idx) rn
         |  FROM l
         |), agg AS (
         |  SELECT doc_id, count(*) AS nk,
         |    string_agg(line, chr(10) ORDER BY idx) AS ctext
         |  FROM r WHERE rn = 1 GROUP BY doc_id
         |)
         |SELECT p.doc_id,
         |  CAST(len(string_split(p.page, chr(10))) AS BIGINT) AS n_lines,
         |  CAST(coalesce(agg.nk, 0) AS BIGINT) AS n_kept_lines,
         |  coalesce(agg.ctext, '') AS cleaned_text
         |FROM pages p LEFT JOIN agg ON p.doc_id = agg.doc_id
         |ORDER BY p.doc_id""".stripMargin))
}
