package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS/restic/FastCDC primitive):
  * split each document at positions where a rolling polynomial hash of
  * the trailing `w`-char window hits a mask, so chunk boundaries are a
  * function of LOCAL content only. Insert or delete one character and
  * every boundary outside the edited window survives unchanged —
  * which is what makes chunk-grain dedup robust to shifted content,
  * where fixed-size blocks would misalign every block after the edit.
  * At 100 TB this is the storage-side dedup rung below the document
  * dedup family: near-identical documents (boilerplate + small edits)
  * share most of their chunk hashes even when doc-level MinHash calls
  * them distinct.
  *
  * Reference scope: no chunking exists in the reference; this is part
  * of the beyond-parity LLM-pipeline family (cf. the exact-substring
  * dedup operator, which finds shared 50-grams — CDC finds shared
  * variable-size extents with O(1) state per position).
  *
  * Determinism discipline: the hash is an exact integer polynomial
  * Σ c_j · (B^(w−1−j) mod M) over the window's code points, with the
  * premultiplied power table emitted as the SAME literal array into
  * both the Spark plan and the DuckDB oracle ([[powerTable]]), and the
  * boundary predicate is `sum % 2^maskBits == 0`. Because 2^maskBits
  * divides M, reducing the powers mod M does not change the predicate
  * (a·(B^k mod M) ≡ a·B^k (mod 2^maskBits)) — documented so nobody
  * "fixes" the missing outer mod-M.
  *
  * Scale shape: boundary detection is a per-row narrow HOF chain
  * (sequence → filter with a w-term inner aggregate) — no shuffle, no
  * UDF, stays inside whole-stage codegen. The recompute-per-position
  * costs w multiplies per character instead of the rolling O(1)
  * update; that is a constant factor of w=16 on embarrassingly
  * parallel work, traded for a pure-expression plan (the rolling
  * update needs cross-element state that SQL HOFs cannot carry without
  * an O(n²) aggregate-per-prefix). Chunk hashes are md5 of the chunk
  * substring — only (16-byte hash, doc_id) pairs ever shuffle.
  */
object Cdc {

  val Window = 16
  val Base = 31L
  val Mod = 1L << 20
  val MaskBits = 6 // boundary when hash % 64 == 0 → ~64-char avg chunks

  /** B^(w−1−j) mod M for j = 0..w−1 — shared verbatim by the Spark
    * plan and the oracle SQL. */
  val powerTable: Seq[Long] =
    (0 until Window).map(j =>
      BigInt(Base).modPow(BigInt(Window - 1 - j), BigInt(Mod)).toLong)

  /** Chunk every document: returns one row per chunk —
    * (idCol, chunk_idx [1-based], start [1-based char], len,
    * chunk_hash [md5 hex of the chunk text]).
    *
    * Boundary rule: position i (1-based, i ≥ w) ends a chunk when the
    * polynomial hash of chars [i−w+1, i] satisfies the mask; the final
    * position always ends the last chunk. Documents shorter than the
    * window are a single chunk. Empty documents yield no rows. */
  def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window
    val mask = (1L << MaskBits) - 1 + 1 // 2^maskBits
    val pw = array(powerTable.map(lit): _*)
    // Boundary detection is a TRUE rolling update folded by ONE
    // `aggregate` over positions w+1..n: hₚ = ((hₚ₋₁ + 255·M −
    // c_out·(B^(w−1) mod M))·B + c_in) mod M — two char reads per
    // position instead of re-summing the w-term window (the direct
    // recompute measured 4.5 s at sf0.1; this shape ~8× less char
    // work and no per-position sequence alloc). The +255·M is ≡ 0
    // (mod M) so the residue is unchanged; it keeps the pre-mod value
    // non-negative only for Latin-1 (ascii() returns full code
    // points, so a char above U+00FF can drive the intermediate
    // negative) — correctness does NOT depend on sign: Spark's % is
    // sign-carrying and congruence mod M (hence mod 2^maskBits | M)
    // survives it, which is what the boundary predicate tests. Do not
    // "fix" a negative intermediate here. The ORACLE keeps the direct
    // Σ c·(B^k mod M) formula: both reduce to the same value mod M,
    // and the boundary predicate is mod 2^maskBits | M — CdcSpec's
    // partition-invariance plus the oracle gate pin the equivalence.
    // No precomputed code-point array column on purpose: an array
    // alias read from inside a lambda is fair game for CollapseProject
    // inlining, which would rebuild the n-element array once per
    // element ACCESS (the corpus-sized-subtree-per-element HOF trap,
    // see Dedup.lineDedup) — measured minutes-vs-seconds at sf0.01.
    val pwTop = powerTable.head // B^(w-1) mod M
    def chr(p: Column): Column =
      ascii(col("_t").substr(p, lit(1))).cast("long")
    // seed: the direct w-term hash of the first window [1..w]
    val h0 = (0 until w).map(j => chr(lit(j + 1)) * lit(powerTable(j)))
      .reduce(_ + _)
    val seedBnd = when(h0 % lit(mask) === 0, array(lit(w)))
      .otherwise(array().cast("array<int>"))
    val rolled = aggregate(
      sequence(lit(w + 1), col("_n")),
      struct((h0 % lit(Mod)).as("h"), seedBnd.as("b")),
      (st, i) => {
        val h2 = ((st.getField("h") + lit(255L * Mod) -
          chr(i - lit(w)) * lit(pwTop)) * lit(Base) + chr(i)) % lit(Mod)
        struct(h2.as("h"),
          when(h2 % lit(mask) === 0,
            concat(st.getField("b"), array(i)))
            .otherwise(st.getField("b")).as("b"))
      },
      st => st.getField("b"))
    val withBnd = docs
      .select(col(idCol), col(textCol).as("_t"))
      .withColumn("_n", length(col("_t")))
      .where(col("_n") > 0)
      .withColumn("_bnd",
        when(col("_n") > w, rolled)
          .when(col("_n") === w, seedBnd) // sequence(w+1, w) would run DESC
          .otherwise(array().cast("array<int>")))
      .withColumn("_ends",
        when(size(col("_bnd")) > 0 &&
            element_at(col("_bnd"), -1) === col("_n"), col("_bnd"))
          .otherwise(concat(col("_bnd"), array(col("_n")))))
      .withColumn("_starts",
        concat(array(lit(1)),
          transform(slice(col("_ends"), lit(1), size(col("_ends")) - 1),
            e => e + 1)))
    withBnd
      .select(col(idCol), col("_t"),
        posexplode(arrays_zip(col("_starts"), col("_ends"))))
      .select(col(idCol),
        (col("pos") + 1).as("chunk_idx"),
        col("col._starts").as("start"),
        (col("col._ends") - col("col._starts") + 1).as("len"),
        md5(col("_t").substr(col("col._starts"),
          col("col._ends") - col("col._starts") + 1).cast("binary"))
          .as("chunk_hash"))
  }

  /** Per-document chunk/dedup rollup: n_chunks, chunk_len_sum (equals
    * the doc length — a structural self-check the oracle enforces),
    * and n_shared_chunks = how many of the doc's chunks also occur in
    * at least one OTHER document. The sharing join is keyed on the
    * 16-byte chunk hash — chunk text never shuffles. */
  def chunkStats(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val ch = chunks(docs, idCol, textCol)
    val docsPerHash = ch.groupBy("chunk_hash")
      .agg(countDistinct(col(idCol)).as("_nd"))
    ch.join(docsPerHash, Seq("chunk_hash"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_chunks"),
        sum("len").cast("long").as("chunk_len_sum"),
        sum(when(col("_nd") > 1, 1L).otherwise(0L)).as("n_shared_chunks"))
  }
}
