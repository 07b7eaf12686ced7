package graft.queries

/** Pinned-rule DuckDB oracle for q_bpe_encode — the IvfOracle pattern
  * applied to the BPE tokenizer family.
  *
  * [[graft.operators.Tokenizer.bpeTrain]] is deterministic (seed-free:
  * the per-merge argmax is total-ordered by (count desc, left, right)),
  * so the merge rules learned at the correctness-gate SF are pinned below
  * as Scala literals and fed to `Tokenizer.encode` by the q_bpe_encode
  * query itself — the query never re-trains. The sequential merge
  * application (the one step SQL cannot express) is pinned as the
  * word → subword segmentation of every corpus word; everything AFTER
  * segmentation — subword frequencies, the (n desc, subword) id ranking,
  * per-document (word-index, subword-index) reassembly — is replayed
  * live in SQL, so the oracle checks the whole distributed encode plan,
  * not a canned answer.
  *
  * Validity: the pinned segmentation table must cover every corpus word,
  * i.e. corpus vocab ⊆ gate-SF vocab. The synthetic documents generator
  * draws from one fixed word list at every SF (verified sf0.01 == sf0.1),
  * so the oracle holds at all test SFs; a corpus with new words needs
  * regeneration via `sbt "Test/runMain graft.operators.DumpBpeOracle
  * <sfDir>"` (single-source [[template]], same no-drift discipline as
  * [[IvfOracle]]).
  */
object BpeOracle {
  /** Merge-rule budget — DumpBpeOracle trains with the same number. */
  val merges: Int = 30

  /** Full oracle SQL around segmentation VALUES rows
    * ("('word', ['sub', ...])" strings). Single source of the pipeline
    * SQL for generator + pinned oracle. */
  /** The shared pipeline CTEs (pinned segmentation → tokens → id vocab)
    * — single source for [[template]] AND [[exampleTemplate]], so the
    * two gates can't drift. */
  private def coreCtes(segRows: Seq[String]): String = {
    val values = segRows.map("    " + _).mkString(",\n")
    s"""WITH seg AS (
      |  SELECT word, CAST(subs AS VARCHAR[]) AS subs FROM (VALUES
      |$values
      |  ) AS t(word, subs)
      |), d AS (
      |  SELECT doc_id, list_filter(
      |    string_split_regex(lower(trim(text)), '\\s+'),
      |    x -> length(x) > 0) AS tk
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, unnest(range(1, len(tk) + 1)) AS widx, tk FROM d
      |), wx AS (
      |  SELECT doc_id, widx, tk[widx] AS word FROM w
      |), sw AS (
      |  SELECT wx.doc_id, wx.widx, s.subs,
      |    unnest(range(1, len(s.subs) + 1)) AS sidx
      |  FROM wx JOIN seg s USING (word)
      |), tok AS (
      |  SELECT doc_id, widx, sidx, subs[sidx] AS subword FROM sw
      |), vocab AS (
      |  SELECT subword,
      |    row_number() OVER (ORDER BY count(*) DESC, subword) AS tok_id
      |  FROM tok GROUP BY subword
      |)""".stripMargin
  }

  def template(segRows: Seq[String]): String =
    coreCtes(segRows) + "\n" +
      """SELECT t.doc_id,
        |  array_to_string(list(v.tok_id ORDER BY t.widx, t.sidx), ',')
        |    AS input_ids_csv
        |FROM tok t JOIN vocab v USING (subword)
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""".stripMargin

  /** q_train_examples oracle: the encode pipeline above, then per-source
    * EOS-joined concatenation in doc-id order, exclusive prefix-sum
    * offsets, and fixed-64-token example chunking — integer counts/sums
    * only, so the compare is exact. */
  def exampleTemplate(segRows: Seq[String]): String =
    coreCtes(segRows) + ",\n" +
      """ids AS (
        |  SELECT t.doc_id, list(v.tok_id ORDER BY t.widx, t.sidx) AS idsv
        |  FROM tok t JOIN vocab v USING (subword)
        |  GROUP BY t.doc_id
        |), ds AS (
        |  SELECT s.source, i.doc_id, i.idsv,
        |    CAST(len(i.idsv) + 1 AS BIGINT) AS n1
        |  FROM ids i JOIN documents s USING (doc_id)
        |), offs AS (
        |  SELECT source, doc_id, idsv,
        |    coalesce(sum(n1) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS off
        |  FROM ds
        |), tp AS (
        |  SELECT source, off + j - 1 AS gpos,
        |    CASE WHEN j <= len(idsv) THEN idsv[j] ELSE 0 END AS tok_id
        |  FROM (SELECT source, off, idsv,
        |          unnest(range(1, len(idsv) + 2)) AS j
        |        FROM offs)
        |)
        |SELECT source, CAST(floor(gpos / 64) AS BIGINT) AS example_idx,
        |  CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(arg_min(tok_id, gpos) AS BIGINT) AS first_tok,
        |  CAST(sum(tok_id) AS BIGINT) AS sum_ids
        |FROM tp GROUP BY source, example_idx
        |ORDER BY source, example_idx""".stripMargin

  /** Merge rules trained at the gate SF by DumpBpeOracle (application
    * order). */
  val pinnedRules: Seq[(String, String)] = Seq(
    ("e", "r"),
    ("e", "</w>"),
    ("n", "</w>"),
    ("er", "</w>"),
    ("o", "w"),
    ("ow", "</w>"),
    ("o", "r"),
    ("s", "t"),
    ("h", "</w>"),
    ("a", "t"),
    ("l", "u"),
    ("i", "n"),
    ("a", "</w>"),
    ("g", "</w>"),
    ("y", "</w>"),
    ("a", "r"),
    ("p", "ar"),
    ("t", "</w>"),
    ("i", "n</w>"),
    ("j", "o"),
    ("jo", "in</w>"),
    ("a", "s"),
    ("as", "h</w>"),
    ("h", "ash</w>"),
    ("r", "ow</w>"),
    ("at", "c"),
    ("atc", "h</w>"),
    ("b", "atch</w>"),
    ("a", "n</w>"),
    ("c", "an</w>"))

  /** word → subwords segmentation of the gate-SF vocabulary under
    * [[pinnedRules]], printed by DumpBpeOracle. */
  private val pinnedSegRows: Seq[String] = Seq(
    "('a', ['a</w>'])",
    "('agg', ['a', 'g', 'g</w>'])",
    "('batch', ['batch</w>'])",
    "('big', ['b', 'i', 'g</w>'])",
    "('column', ['c', 'o', 'lu', 'm', 'n</w>'])",
    "('customer', ['c', 'u', 'st', 'o', 'm', 'er</w>'])",
    "('data', ['d', 'at', 'a</w>'])",
    "('dup', ['d', 'u', 'p', '</w>'])",
    "('fast', ['f', 'a', 'st', '</w>'])",
    "('filter', ['f', 'i', 'l', 't', 'er</w>'])",
    "('group', ['g', 'r', 'o', 'u', 'p', '</w>'])",
    "('hash', ['hash</w>'])",
    "('join', ['join</w>'])",
    "('key', ['k', 'e', 'y</w>'])",
    "('line', ['l', 'in', 'e</w>'])",
    "('merge', ['m', 'er', 'g', 'e</w>'])",
    "('order', ['or', 'd', 'er</w>'])",
    "('part', ['par', 't</w>'])",
    "('query', ['q', 'u', 'er', 'y</w>'])",
    "('row', ['row</w>'])",
    "('scan', ['s', 'can</w>'])",
    "('slow', ['s', 'l', 'ow</w>'])",
    "('small', ['s', 'm', 'a', 'l', 'l', '</w>'])",
    "('sort', ['s', 'or', 't</w>'])",
    "('spark', ['s', 'par', 'k', '</w>'])",
    "('stream', ['st', 'r', 'e', 'a', 'm', '</w>'])",
    "('table', ['t', 'a', 'b', 'l', 'e</w>'])",
    "('the', ['t', 'h', 'e</w>'])",
    "('value', ['v', 'a', 'lu', 'e</w>'])",
    "('vector', ['v', 'e', 'c', 't', 'or', '</w>'])",
    "('window', ['w', 'in', 'd', 'ow</w>'])")

  val sql: String = template(pinnedSegRows)
  val exampleSql: String = exampleTemplate(pinnedSegRows)
}
