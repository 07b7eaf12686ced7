package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm): hash every character k-gram of the normalized text, then
  * keep the minimum hash of each sliding window of `w` consecutive gram
  * hashes. The guarantee: any shared substring of length >= w + k - 1
  * between two documents yields at least one shared fingerprint, with a
  * fingerprint density of ~2/(w+1) — a tunable, position-robust sketch for
  * substring-level overlap detection (the gap between whole-document
  * minhash and exact span dedup).
  *
  * Everything is row-local array math inside whole-stage codegen — no
  * shuffle, no UDF. The downstream overlap join (fingerprint → docs
  * sharing it) is a keyed shuffle on 8-byte fingerprints, never text —
  * same discipline as the minhash/simhash/span-dedup family.
  */
object Winnow {

  /** Distinct winnowing fingerprints per document: (idCol, fp). With
    * `portable = true` grams are hashed with the first-7-md5-bytes
    * little-endian value (== `Hashing.md5Long56` == DuckDB
    * `md5_number_upper % 2^56`), so the oracle twin replays the exact
    * fingerprint set; the default is the dedup family's fast 64-bit
    * string hash. Documents shorter than one full window (len < k + w - 1
    * normalized chars) produce no rows — too short to fingerprint at this
    * (k, w).
    *
    * The per-row work is a deliberate Scala kernel, not higher-order
    * array expressions, for the [[Dedup.minhashSig]] reason: `transform`
    * lambdas evaluate interpreted (no whole-stage codegen), re-deriving
    * the hash tree per window — an expression formulation measured 16 s
    * at sf0.1 where this kernel takes well under a second. The kernel is
    * O(n) per row via a monotonic-deque sliding minimum. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int, portable: Boolean = false): DataFrame = {
    val kernel = udf { (norm: String) => winnowKernel(norm, k, w, portable) }
    val norm = regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
    df.where(length(norm) >= k + w - 1)
      .select(col(idCol), explode(kernel(norm)).as("fp"))
  }

  /** Distinct sliding-window minima over the k-gram hashes of `norm`,
    * ascending. Monotonic deque: each gram index enters and leaves the
    * candidate queue once — O(n) total, constant extra state of at most
    * `w` indices. */
  private[graft] def winnowKernel(norm: String, k: Int, w: Int,
      portable: Boolean): Array[Long] = {
    if (norm == null || norm.length < k + w - 1) return Array.emptyLongArray
    val m = norm.length - k + 1
    val hs = new Array[Long](m)
    if (portable) {
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < m) {
        hs(i) = Dedup.hash64Md5(md, norm.substring(i, i + k)) &
          0xffffffffffffffL // low 7 bytes == md5_number_upper % 2^56
        i += 1
      }
    } else {
      var i = 0
      while (i < m) { hs(i) = Dedup.hash64(norm.substring(i, i + k)); i += 1 }
    }
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](m)   // indices, values increasing
    var head = 0
    var tail = 0                    // exclusive
    var i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    res
  }

  /** Document pairs sharing at least `minShared` fingerprints — the
    * overlap-detection join the fingerprints exist for. Keyed self-join on
    * the 8-byte fingerprint with an early distinct; at corpus scale the
    * fingerprint table is ~2/(w+1) of the corpus' k-gram count and the
    * join never carries text. */
  def overlapPairs(fps: DataFrame, idCol: String,
      minShared: Long = 2): DataFrame = {
    val a = fps.select(col(idCol).as("id_a"), col("fp"))
    val b = fps.select(col(idCol).as("id_b"), col("fp"))
    a.join(b, Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
