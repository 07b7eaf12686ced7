package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngram_matches(hyp, ref, n)`: the clipped (multiset) count of
  * shared character n-grams between two strings — the per-order
  * numerator of chrF — as ONE native codegen'd expression.
  *
  * Why an expression and not the union-agg dataflow
  * ([[graft.operators.EvalMetrics.chrFViaAgg]] keeps that form as the
  * cross-check): chrF is per-PAIR arithmetic, so shuffling every gram
  * to a (pair, order, gram) aggregation moves 6·len rows per side per
  * pair through an Exchange only to reduce them straight back to one
  * row. This kernel does the same reduction row-locally — build both
  * gram arrays, sort, two-pointer count of pairwise equal elements
  * (= Σ_g min(count_h(g), count_r(g)) on sorted multisets) — turning
  * the whole metric into a narrow projection: zero shuffles at any
  * corpus size. O(L log L) per row per order, L = string length.
  *
  * Exactness contract: grams come from `UTF8String.substringSQL`, the
  * SAME code-point-based substring the Column `substr` the agg form
  * explodes uses (and DuckDB's substr in the oracle), so all three
  * produce identical gram multisets on any Unicode input — not just
  * ASCII. EvalMetricsSpec pins native == agg bit-equality on the
  * corpus.
  */
case class CharNgramMatchesExpression(left: Expression,
    right: Expression, n: Int) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if n >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"char_ngram_matches expects (string, string) with literal " +
          s"n >= 1, got (${left.dataType.sql}, ${right.dataType.sql}), " +
          s"n=$n")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CharNgramMatchesExpression.matches(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = CharNgramMatchesExpression.getClass.getName
      .stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = $cls.matches($a, $b, $n);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharNgramMatchesExpression {

  /** Sorted-multiset two-pointer intersection over code-point n-grams.
    * Gram boundaries are code-point-exact — identical values to
    * `substringSQL` (and so to Column.substr / DuckDB substr), but
    * computed from ONE offset-indexing pass per string: substringSQL
    * walks from byte 0 on every call, which would make gram
    * extraction O(L²) per row on long multi-byte documents — the
    * silent hot-spot class a 100 TB corpus always finds. */
  def matches(a: UTF8String, b: UTF8String, n: Int): Long = {
    val xs = grams(a, n)
    val ys = grams(b, n)
    if (xs.length == 0 || ys.length == 0) return 0L
    java.util.Arrays.sort(xs.asInstanceOf[Array[Object]])
    java.util.Arrays.sort(ys.asInstanceOf[Array[Object]])
    var j = 0
    var k = 0
    var c = 0L
    while (j < xs.length && k < ys.length) {
      val cmp = xs(j).compareTo(ys(k))
      if (cmp < 0) j += 1
      else if (cmp > 0) k += 1
      else { c += 1; j += 1; k += 1 }
    }
    c
  }

  /** All code-point n-grams of `s` via one offset-indexing pass:
    * byte start offsets of every code point first (numBytesForFirstByte
    * is the same stride substringSQL steps by), then each gram is one
    * bounded byte copy. O(L) offset work + O(n·L) gram bytes total. */
  private def grams(s: UTF8String, n: Int): Array[UTF8String] = {
    val bytes = s.getBytes
    val L = s.numChars()
    val cnt = L - n + 1
    if (cnt <= 0) return Array.empty
    val offs = new Array[Int](L + 1)
    var i = 0
    var off = 0
    while (i < L) {
      offs(i) = off
      off += UTF8String.numBytesForFirstByte(bytes(off))
      i += 1
    }
    offs(L) = off
    val out = new Array[UTF8String](cnt)
    i = 0
    while (i < cnt) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    out
  }

  /** Column form via the registered SQL function
    * (see [[GraftExtensions]]). */
  def matchesNative(hyp: Column, ref: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("char_ngram_matches",
      hyp, ref, org.apache.spark.sql.functions.lit(n))
}

/** `array_clipped_matches(a, b)`: clipped multiset intersection size
  * of two string arrays — [[CharNgramMatchesExpression]]'s kernel at
  * TOKEN grain (the SQuAD-style token-F1 numerator in
  * [[graft.operators.EvalMetrics.tokenF1]]): sort both arrays,
  * two-pointer count of pairwise equal elements = Σ_t min(count_a(t),
  * count_b(t)). Row-local O(L log L); null ELEMENTS are skipped (a
  * null token matches nothing), null ARRAYS propagate null. */
case class ArrayClippedMatchesExpression(left: Expression,
    right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(StringType, _),
          org.apache.spark.sql.types.ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_clipped_matches expects (array<string>, " +
          s"array<string>), got (${left.dataType.sql}, " +
          s"${right.dataType.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayClippedMatchesExpression.matches(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = ArrayClippedMatchesExpression.getClass.getName
      .stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = $cls.matches($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayClippedMatchesExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def matches(a: ArrayData, b: ArrayData): Long = {
    val xs = nonNullSorted(a)
    val ys = nonNullSorted(b)
    var j = 0
    var k = 0
    var c = 0L
    while (j < xs.length && k < ys.length) {
      val cmp = xs(j).compareTo(ys(k))
      if (cmp < 0) j += 1
      else if (cmp > 0) k += 1
      else { c += 1; j += 1; k += 1 }
    }
    c
  }

  private def nonNullSorted(a: ArrayData): Array[UTF8String] = {
    val n = a.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(m) = a.getUTF8String(i); m += 1 }
      i += 1
    }
    val trimmed = if (m == n) out else java.util.Arrays.copyOf(out, m)
    java.util.Arrays.sort(trimmed.asInstanceOf[Array[Object]])
    trimmed
  }

  /** Column form via the registered SQL function
    * (see [[GraftExtensions]]). */
  def matchesNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function(
      "array_clipped_matches", a, b)
}

/** `array_lcs_length(a, b)`: longest-common-subsequence length of two
  * string arrays — the ROUGE-L numerator
  * ([[graft.operators.EvalMetrics.rougeL]]) as one native codegen'd
  * expression, making the whole metric a zero-shuffle narrow
  * projection (the [[CharNgramMatchesExpression]] argument at
  * sequence grain: LCS is per-PAIR arithmetic, so any dataflow that
  * moves tokens through an Exchange only reduces them straight back
  * to one row per pair).
  *
  * Kernel: the classic two-row integer DP —
  * dp[i][j] = dp[i−1][j−1]+1 if x_i = y_j else max(dp[i−1][j],
  * dp[i][j−1]) — O(m·n) time, O(n) space, row-local; per-PAIR work,
  * corpus-independent (the caller bounds token counts — see rougeL's
  * maxTokens — when hypotheses can be pathologically long). Null
  * ARRAYS propagate null; null ELEMENTS are skipped (a null token
  * matches nothing — the [[ArrayClippedMatchesExpression]]
  * convention). EvalMetricsSpec pins bit-equality against a
  * Column-level prefix-max fold (the same recurrence the DuckDB
  * oracle replays as a recursive CTE). */
case class ArrayLcsLengthExpression(left: Expression,
    right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(StringType, _),
          org.apache.spark.sql.types.ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"array_lcs_length expects (array<string>, array<string>), " +
          s"got (${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayLcsLengthExpression.lcsLength(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = ArrayLcsLengthExpression.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = $cls.lcsLength($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayLcsLengthExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def lcsLength(a: ArrayData, b: ArrayData): Long = {
    val xs = nonNull(a)
    val ys = nonNull(b)
    val m = xs.length
    val n = ys.length
    if (m == 0 || n == 0) return 0L
    // two-row DP; cur needs no re-zeroing: index 0 is never written
    // (stays 0 from allocation) and 1..n are overwritten every row
    var prev = new Array[Int](n + 1)
    var cur = new Array[Int](n + 1)
    var i = 1
    while (i <= m) {
      val x = xs(i - 1)
      var j = 1
      while (j <= n) {
        cur(j) =
          if (x.equals(ys(j - 1))) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(n).toLong
  }

  private def nonNull(a: ArrayData): Array[UTF8String] = {
    val n = a.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!a.isNullAt(i)) { out(m) = a.getUTF8String(i); m += 1 }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  /** Column form via the registered SQL function
    * (see [[GraftExtensions]]). */
  def lcsNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("array_lcs_length", a, b)
}

/** `sentence_union_lcs(hyp_sents, ref_sents)`: the summary-level
  * union-LCS hit count of ROUGE-Lsum (Lin 2004 §3.2, with the
  * rouge-score library's GLOBAL token clipping) over two
  * sentence-token arrays (array<array<string>>). Membership first:
  * a reference position p of sentence r_i is a union member iff it
  * participates in SOME optimal LCS of (r_i, c_j) for SOME candidate
  * sentence c_j. Clipping second: per distinct token t, members count
  * only up to the candidate's total supply of t —
  *
  *   hits = Σ_t min(k_t, c_t)
  *
  * where k_t = union-member reference positions holding t (across all
  * reference sentences; ≤ the reference's own supply by construction,
  * so the reference-side clip never binds separately) and c_t = t's
  * count over ALL candidate sentences. This is rouge-score's
  * sequential counter-decrement loop in closed form: tokens consume
  * independent counters, so consumption order cannot matter (r15
  * advice — without the clip, a token matching in more reference
  * sentences than the hypothesis holds it inflated the score on
  * ordinary text: repeated stopwords, recurring entities). A
  * consequence worth naming: hits ≤ Σc_t = |hyp| and ≤ |ref|, so
  * precision and recall are both ≤ 10⁶ ppm now, matching rouge-score.
  *
  * Determinism contract: Lin's LCS_∪ unions "the" LCS token positions,
  * which are ambiguous when several optimal alignments exist — the
  * rouge-score library resolves the ambiguity with one
  * implementation-defined backtrack. This kernel instead uses the
  * alignment-INDEPENDENT membership test (position p is in the union
  * iff ∃q: x_p = y_q ∧ fwd(p−1, q−1) + 1 + bwd(p+1, q+1) = LCS — the
  * classic prefix/suffix decomposition), which depends only on DP
  * VALUES, never on a tie-break rule, so Spark kernel, the spec's
  * Scala reference, and the DuckDB recursive-CTE oracle provably agree
  * on every input. On Lin's own w1..w5 example both definitions give
  * 4. Residual documented deviation from rouge-score: the ∃-optimal
  * union can be a superset of one fixed backtrack's positions, so on
  * inputs where the backtrack choice matters AND the clip does not
  * bind, this can read a token higher — bounded by the clip either way.
  *
  * O(Σ_i Σ_j m_i·n_j) per pair (two full DP tables per sentence pair —
  * prefix and suffix), row-local; the caller bounds sentence token
  * counts (rougeLsum's maxTokens) when inputs can be pathological.
  * Null ARRAYS propagate null; null sentences/tokens are skipped. */
case class SentenceUnionLcsExpression(left: Expression,
    right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(StringType, _), _),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sentence_union_lcs expects (array<array<string>>, " +
          s"array<array<string>>), got (${left.dataType.sql}, " +
          s"${right.dataType.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SentenceUnionLcsExpression.unionLcs(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = SentenceUnionLcsExpression.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = $cls.unionLcs($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SentenceUnionLcsExpression {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def unionLcs(hyp: ArrayData, ref: ArrayData): Long = {
    val hs = sentences(hyp)
    val rs = sentences(ref)
    // global candidate token supply — the clipping counters
    // (rouge-score's token_cnts_c; the ref-side counter is provably
    // redundant here, see the scaladoc)
    val supply = new java.util.HashMap[UTF8String, Int]()
    var j = 0
    while (j < hs.length) {
      val y = hs(j)
      var q = 0
      while (q < y.length) {
        supply.merge(y(q), 1, (a, b) => a + b)
        q += 1
      }
      j += 1
    }
    var hits = 0L
    var i = 0
    while (i < rs.length) {
      val x = rs(i)
      val m = x.length
      if (m > 0 && hs.length > 0) {
        val marked = new Array[Boolean](m + 1)
        var k = 0
        while (k < hs.length) {
          if (hs(k).length > 0) markPositions(x, hs(k), marked)
          k += 1
        }
        var p = 1
        while (p <= m) {
          if (marked(p)) {
            val left = supply.getOrDefault(x(p - 1), 0)
            if (left > 0) { hits += 1; supply.put(x(p - 1), left - 1) }
          }
          p += 1
        }
      }
      i += 1
    }
    hits
  }

  /** Mark every position of `x` that participates in SOME optimal LCS
    * of (x, y): fwd(p−1)(q−1) + 1 + bwd(m−p)(n−q) == L for some q with
    * x_p = y_q, where bwd is the prefix DP of the reversed sequences
    * (bwd(i)(j) = LCS of the last i of x and last j of y). */
  private def markPositions(x: Array[UTF8String], y: Array[UTF8String],
      marked: Array[Boolean]): Unit = {
    val m = x.length
    val n = y.length
    val fwd = lcsTable(x, y, rev = false)
    val bwd = lcsTable(x, y, rev = true)
    val total = fwd(m)(n)
    var p = 1
    while (p <= m) {
      if (!marked(p)) {
        val xp = x(p - 1)
        var q = 1
        while (q <= n && !marked(p)) {
          if (xp.equals(y(q - 1)) &&
            fwd(p - 1)(q - 1) + 1 + bwd(m - p)(n - q) == total)
            marked(p) = true
          q += 1
        }
      }
      p += 1
    }
  }

  /** Full (m+1)×(n+1) LCS prefix table; `rev = true` computes it over
    * the reversed sequences (indexing from the tails) without copying. */
  private def lcsTable(x: Array[UTF8String], y: Array[UTF8String],
      rev: Boolean): Array[Array[Int]] = {
    val m = x.length
    val n = y.length
    val dp = Array.ofDim[Int](m + 1, n + 1)
    var i = 1
    while (i <= m) {
      val xi = if (rev) x(m - i) else x(i - 1)
      val prev = dp(i - 1)
      val cur = dp(i)
      var j = 1
      while (j <= n) {
        val yj = if (rev) y(n - j) else y(j - 1)
        cur(j) =
          if (xi.equals(yj)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      i += 1
    }
    dp
  }

  /** Outer array → per-sentence token arrays; null sentences dropped,
    * null tokens skipped (the [[ArrayLcsLengthExpression]] convention). */
  private def sentences(a: ArrayData): Array[Array[UTF8String]] = {
    val n = a.numElements()
    val out = new Array[Array[UTF8String]](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val inner = a.getArray(i)
        val k = inner.numElements()
        val toks = new Array[UTF8String](k)
        var j = 0
        var t = 0
        while (j < k) {
          if (!inner.isNullAt(j)) { toks(t) = inner.getUTF8String(j); t += 1 }
          j += 1
        }
        out(m) =
          if (t == k) toks else java.util.Arrays.copyOf(toks, t)
        m += 1
      }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  /** Column form via the registered SQL function
    * (see [[GraftExtensions]]). */
  def unionLcsNative(hypSents: Column, refSents: Column): Column =
    org.apache.spark.sql.functions.call_function("sentence_union_lcs",
      hypSents, refSents)
}
