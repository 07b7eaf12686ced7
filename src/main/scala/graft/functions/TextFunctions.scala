package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale document pipelines (the
  * beyond-parity operator set: token counting, quality scoring, language
  * ID, fingerprinting, shingling). All pure `functions._` compositions or
  * tiny deterministic UDFs, designed to run over a `documents(text)` column
  * at corpus scale — per-row, no shuffle, codegen-friendly where possible.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, 0L)
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword-piece count: word characters in runs of ≤ 4 plus
    * standalone non-word symbols — a cheap deterministic proxy for
    * tokenizer budget estimation (a real tokenizer would plug in as the
    * same shaped column function). */
  def tokenCountBpeish(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w{1,4}|[^\\w\\s]"), lit(0)))
      .cast("long")

  /** Punctuation ratio: punctuation chars / total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(length(text) === 0, 0.0)
      .otherwise(punct.cast("double") / length(text))
  }

  /** Uppercase ratio over letters. */
  def upperRatio(text: Column): Column = {
    val letters = length(regexp_replace(text, "[^A-Za-z]", ""))
    val uppers = length(regexp_replace(text, "[^A-Z]", ""))
    when(letters === 0, 0.0).otherwise(uppers.cast("double") / letters)
  }

  /** English stopword hit ratio over whitespace tokens — the core of the
    * n-gram/stopword language-ID heuristic. */
  val enStopwords: Seq[String] = Seq("the", "of", "and", "to", "in", "a",
    "is", "that", "for", "it", "was", "on", "with", "as", "are", "at",
    "be", "this", "by", "from")

  def stopwordRatio(text: Column,
      stopwords: Seq[String] = enStopwords): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(size(toks) === 0 || (size(toks) === 1 && toks.getItem(0) === ""), 0.0)
      .otherwise(hits.cast("double") / size(toks))
  }

  /** Quality score in [0,1]: length sweet-spot, low punctuation noise,
    * sane casing, some stopword mass (the usual pretraining-filter
    * heuristics, each a clamped sub-score averaged together). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 4)
    val caseScore = greatest(lit(0.0), lit(1.0) - upperRatio(text) * 2)
    val stopScore = least(stopwordRatio(text) * 5, lit(1.0))
    (lenScore + punctScore + caseScore + stopScore) / 4
  }

  /** Exact-integer preference-quality score shared by the BT-ranking
    * (q_bt_rank) and DPO-pairing (q_dpo_pairs) queries: stopword hits
    * × 1000 + whitespace token count capped at 999 — a deterministic
    * BIGINT "answer quality" proxy both engines compute identically (no
    * floats, no rounding ties). Defined once here with its SQL twin
    * [[prefScoreSql]] so the two query/oracle pairs cannot drift. */
  def prefScore(text: Column): Column = {
    val stopHits = size(filter(split(lower(trim(text)), "\\s+"),
      t => t.isInCollection(enStopwords))).cast("long")
    stopHits * 1000L + least(tokenCountWs(text), lit(999L))
  }

  /** DuckDB twin of [[prefScore]] over `inner` — generated from the
    * same stopword table and cap, so the oracle cannot drift. */
  def prefScoreSql(inner: String): String = {
    val stops = enStopwords.map(w => s"'$w'").mkString(",")
    s"CAST(len(list_filter(string_split_regex(lower(trim($inner)), " +
      s"'\\s+'), x -> x IN ($stops))) AS BIGINT) * 1000 + " +
      s"least(CASE WHEN length(trim($inner)) = 0 THEN 0 " +
      s"ELSE CAST(len(string_split_regex(trim($inner), '\\s+')) " +
      s"AS BIGINT) END, 999)"
  }

  /** Heuristic language ID over a configurable stopword table; returns the
    * language with the highest stopword hit count, 'und' when nothing
    * matches. Extendable per language; deterministic. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> enStopwords,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los",
      "se", "del", "las", "por", "con", "para", "es", "al", "lo"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "du",
      "en", "est", "que", "dans", "pour", "qui", "sur", "pas", "au"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu",
      "mit", "sich", "auf", "ist", "im", "dem", "nicht", "ein", "eine"),
    "it" -> Seq("il", "di", "che", "la", "per", "con", "del", "una",
      "sono", "non", "alla", "nel", "gli", "come", "anche", "piu"),
    "pt" -> Seq("de", "que", "do", "da", "em", "um", "para", "com",
      "uma", "os", "no", "na", "por", "mais", "dos", "como", "mas"),
    "nl" -> Seq("de", "het", "een", "van", "en", "dat", "is", "op",
      "te", "zijn", "met", "voor", "niet", "aan", "er", "maar", "ook"),
    "sv" -> Seq("och", "att", "det", "som", "en", "på", "är", "av",
      "för", "med", "till", "den", "har", "inte", "om", "ett", "han"),
    "pl" -> Seq("i", "w", "nie", "na", "się", "z", "do", "to", "że",
      "jest", "jak", "po", "co", "tak", "ale", "od", "za", "przez"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "gibi", "daha",
      "çok", "ama", "olarak", "sonra", "kadar", "her", "ben", "bana"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak",
      "ini", "dari", "dalam", "akan", "pada", "juga", "saya", "karena"),
    "ru" -> Seq("и", "в", "не", "на", "что", "он", "как", "это", "по",
      "но", "из", "за", "то", "же", "мы", "они", "его", "был"))

  def langId(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = langStopwords.toSeq.sortBy(_._1).map { case (lang, sw) =>
      struct(size(filter(toks, t => t.isInCollection(sw))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scores: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise("und")
  }

  /** Intra-document repetition: fraction of word n-gram OCCURRENCES that
    * are repeats of an earlier gram in the same document (the
    * Gopher/C4-style duplicate-n-gram filter signal). 0 = no repetition,
    * → 1 as the document degenerates into loops. Total minus distinct
    * over total; engine-exact (integer counts, one division). */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val norm = regexp_replace(lower(trim(text)), "\\s+", " ")
    val toks = split(norm, " ")
    val total = greatest(size(toks) - (n - 1), lit(0))
    val distinctGrams = size(wordShingles(text, n))
    when(total <= 0, 0.0)
      .otherwise((total - distinctGrams).cast("double") / total)
  }

  /** Gopher repetition-filter statistics (Rae et al. 2021, Table A1 —
    * the published quality-filter family): returns a struct of
    * (dup_line_frac, dup_line_char_frac, top n-gram char fraction,
    * duplicated m-gram char fraction). One row-local pass — narrow, no
    * shuffle; every stat is a per-document reduction, which is the
    * 100 TB shape. Deliberately a Scala kernel: the per-row line/gram
    * group-counting needs a hash map, which HOF expressions cannot
    * build (and interpreted HOFs re-evaluate subtrees per element —
    * the measured trap).
    *
    * Conventions (each deterministic and SQL-replayable, pinned by the
    * q_gopher_repetition oracle):
    *  - lines: '\n'-split, space-trimmed, empties dropped;
    *    dup_line_frac = (occurrences − distinct)/occurrences;
    *    dup_line_char_frac weights each occurrence beyond a line's
    *    first by its character length.
    *  - top gram: word `topN`-grams over the whitespace-normalized
    *    lower text; fraction = chars(top gram)·count / chars(normalized
    *    text); ties break to the lexicographically smallest gram.
    *  - dup gram: occurrence-weighted — Σ count·chars over `dupN`-grams
    *    with count ≥ 2, over Σ count·chars of all dupN-grams (the paper
    *    de-overlaps covered characters; the occurrence-weighted variant
    *    is the common reimplementation and replays exactly in SQL). */
  def gopherStats(text: Column, topN: Int = 2, dupN: Int = 5): Column = {
    val kernel = udf((s: String, tn: Int, dn: Int) =>
      gopherStatsKernel(s, tn, dn))
    kernel(text, lit(topN), lit(dupN))
  }

  private[graft] def gopherStatsKernel(s: String, topN: Int,
      dupN: Int): (Double, Double, Double, Double) = {
    if (s == null || s.isEmpty) return (0.0, 0.0, 0.0, 0.0)
    val lines = s.split('\n').map(_.trim).filter(_.nonEmpty)
    var dupLineFrac = 0.0
    var dupLineCharFrac = 0.0
    if (lines.nonEmpty) {
      val groups = lines.groupBy(identity).view.mapValues(_.length)
      val total = lines.length.toLong
      dupLineFrac = (total - groups.size).toDouble / total
      var dupChars = 0L
      var allChars = 0L
      groups.foreach { case (l, c) =>
        allChars += c.toLong * l.length
        dupChars += (c - 1).toLong * l.length
      }
      if (allChars > 0) dupLineCharFrac = dupChars.toDouble / allChars
    }
    val norm = s.trim.toLowerCase.replaceAll("\\s+", " ")
    val words: Array[String] =
      if (norm.isEmpty) Array.empty else norm.split(' ')
    def gramCounts(n: Int): Map[String, Int] =
      if (words.length < n) Map.empty
      else (0 to words.length - n)
        .map(i => words.slice(i, i + n).mkString(" "))
        .groupBy(identity).view.mapValues(_.length).toMap
    val topG = gramCounts(topN)
    val topFrac =
      if (topG.isEmpty || norm.isEmpty) 0.0
      else {
        // max count, ties to the lexicographically smallest gram
        val (g, c) = topG.minBy { case (g, c) => (-c, g) }
        (c.toLong * g.length).toDouble / norm.length
      }
    val dupG = gramCounts(dupN)
    var dupNum = 0L
    var dupDen = 0L
    dupG.foreach { case (g, c) =>
      dupDen += c.toLong * g.length
      if (c >= 2) dupNum += c.toLong * g.length
    }
    val dupFrac = if (dupDen > 0) dupNum.toDouble / dupDen else 0.0
    (dupLineFrac, dupLineCharFrac, topFrac, dupFrac)
  }

  /** Deflate compression ratio of the UTF-8 text: compressed/original
    * size — the Gopher-family "too compressible = too repetitive, too
    * incompressible = noise" quality heuristic, which catches loop spam
    * that token-level repetition misses (repeats longer than the n-gram
    * window, repeated paragraphs). Deterministic: java.util.zip with a
    * fixed level is stable across JVMs. Per-row Scala kernel (a codec is
    * not expressible as Catalyst expressions); narrow, no shuffle.
    * Spec-gated — DuckDB has no SQL deflate, so there is deliberately no
    * oracle twin. */
  def compressionRatio(text: Column): Column = {
    val kernel = udf { (s: String) =>
      if (s == null || s.isEmpty) 1.0
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val d = new java.util.zip.Deflater(6, false)
        d.setInput(bytes); d.finish()
        val buf = new Array[Byte](bytes.length + 64)
        var n = 0
        // only the SIZE is needed; the buffer is scratch space
        while (!d.finished()) n += d.deflate(buf, 0, buf.length)
        d.end()
        n.toDouble / bytes.length
      }
    }
    kernel(text)
  }

  /** PII patterns (emails, IPv4, US-style phone numbers) restricted to the
    * RE2 ∩ java.util.regex common dialect — no lookaround, no backrefs —
    * so the Spark expressions and the DuckDB oracle match byte for byte. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern =
    "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val phonePattern = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Count of PII matches per category, counted SEQUENTIALLY on the
    * partially-redacted text (emails first, then IPs, then phones) so the
    * counts agree with [[redactPii]]'s placeholders — a phone-shaped run
    * inside an email local part counts once, as the email it is part of. */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, emailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    (size(regexp_extract_all(text, lit(emailPattern), lit(0))).cast("long"),
      size(regexp_extract_all(afterEmail, lit(ipv4Pattern), lit(0)))
        .cast("long"),
      size(regexp_extract_all(afterIp, lit(phonePattern), lit(0)))
        .cast("long"))
  }

  /** Redact all three PII categories with typed placeholder tokens —
    * email first so its host part is not half-eaten by the IP rule. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val i = regexp_replace(e, ipv4Pattern, "<IP>")
    regexp_replace(i, phonePattern, "<PHONE>")
  }

  /** URL extraction + registered-domain blocklisting (the C4/RefinedWeb
    * domain-filter step). Same RE2 ∩ java.util.regex dialect rule as the
    * PII patterns so the DuckDB oracle matches byte for byte. */
  val urlPattern = "https?://[A-Za-z0-9.-]+(/[^ \\t\\n]*)?"
  val urlHostPattern = "https?://([A-Za-z0-9.-]+)"

  /** All URL occurrences in the text, in order. */
  def urls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Naive registered domain of one URL: the last two dot-labels of the
    * host ("a.b.site.example" → "site.example"; single-label hosts pass
    * through). A public-suffix list would slot in here; the two-label
    * rule is deterministic and engine-portable. */
  def registeredDomain(url: Column): Column = {
    val labels = split(regexp_extract(url, urlHostPattern, 1), "\\.")
    concat_ws(".", slice(labels, greatest(size(labels) - 1, lit(1)), lit(2)))
  }

  /** Registered domains of every URL in the text. */
  def domains(text: Column): Column =
    transform(urls(text), u => registeredDomain(u))

  /** True when any URL's registered domain is on the blocklist. */
  def domainBlocked(text: Column, blocklist: Seq[String]): Column =
    arrays_overlap(domains(text),
      array(blocklist.map(lit): _*))

  /** Query-param names dropped by [[canonicalUrl]]: the common tracking
    * decorations (plus any `utm_`-prefixed name) that make one page look
    * like many distinct URLs to a URL-level deduper. */
  val trackingParams: Seq[String] = Seq(
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "igshid",
    "ref", "ref_src")

  /** Canonical form of one absolute URL — the C4/CommonCrawl URL-dedup
    * key: lowercase scheme + host, leading `www.` stripped, default
    * ports dropped (http:80, https:443), fragment stripped, empty path
    * normalized to `/`, tracking params removed ([[trackingParams]] +
    * the `utm_` prefix, name matched case-insensitively) and the
    * surviving query params SORTED so param order can't fork the key.
    * Path and param case are preserved (they are semantic). Returns
    * null for strings without a `scheme://host` shape. All builtins
    * (regexp_extract / HOF filter / array_sort), so the whole
    * canonicalization replays in SQL. Out of contract (→ null, never a
    * mangled key): IPv6 bracket literals (`[::1]` — the `^([^:]*)` host
    * split would truncate them) and userinfo@ hosts (the `@` would ride
    * the host key); relative URLs null out via the missing scheme.
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport = lower(regexp_extract(url, "^[^:/?#]+://([^/?#]+)", 1))
    val host = regexp_replace(regexp_extract(hostport, "^([^:]*)", 1),
      "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path0 = regexp_extract(url, "^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    // non-greedy [^#]*? prefix: the matched '?' is the first one BEFORE
    // any '#', so a fragment-only URL (http://h/p#sec?a=1) keeps no
    // query — a bare "\\?([^#]*)" would resurrect the fragment's tail
    // as query params (r11 advice)
    val query = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p => {
      val name = lower(substring_index(p, "=", 1))
      p =!= "" && !startswith(name, lit("utm_")) &&
        !name.isInCollection(trackingParams)
    })
    val sortedQ = array_join(array_sort(params), "&")
    val qPart = when(sortedQ === "", lit(""))
      .otherwise(concat(lit("?"), sortedQ))
    when(scheme === "" || host === "" ||
        hostport.contains("[") || hostport.contains("@"),
        lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart))
  }

  /** 64-bit rolling-hash document fingerprint (polynomial rolling hash of
    * the whitespace-normalized text) — cheap exact-dup key that is robust
    * to runs of whitespace, computed without materializing a normalized
    * copy per comparison. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Common UTF-8-read-as-cp1252 mojibake digraphs/trigraphs → their
    * intended characters (the high-frequency subset of what ftfy
    * repairs; entries restricted to fully printable garbled forms so
    * the same literals replay verbatim in SQL `replace` chains).
    * Trigraphs (E2 80 xx punctuation) are listed BEFORE digraphs —
    * their lead bytes (â vs Ã) never overlap, but fixed order keeps the
    * Spark chain and the SQL oracle byte-identical by construction. */
  val mojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–",
    "â€”" -> "—", "â€¦" -> "…",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¡" -> "á", "Ã³" -> "ó", "Ãº" -> "ú",
    "Ã±" -> "ñ", "Ã¼" -> "ü", "Ã¶" -> "ö", "Ã¤" -> "ä", "Ã§" -> "ç")

  /** Named/numeric HTML entities handled declaratively (the pinned
    * subset covering the overwhelming majority of web text; arbitrary
    * `&#NNN;` codes need a kernel and are out of scope — documented).
    * `&amp;` is LAST on purpose: standard unescape order, so
    * `&amp;lt;` yields the literal text `&lt;`, not `<`. */
  val htmlEntityTable: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'",
    "&#39;" -> "'", "&#34;" -> "\"", "&nbsp;" -> " ", "&amp;" -> "&")

  private def replaceChain(c: Column, table: Seq[(String, String)]): Column =
    table.foldLeft(c) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to)) }

  /** Strip HTML: script/style blocks (content and all), then every
    * remaining tag, each replaced by a space so token boundaries
    * survive (`a<br>b` → `a b`, never `ab`). RE2-safe patterns — the
    * same regexes run in DuckDB oracles. */
  def stripHtml(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "(?s)<(script|style)[^>]*>.*?</(script|style)>", " "),
      "<[^>]*>", " ")

  /** Unescape the pinned HTML entity subset ([[htmlEntityTable]]). */
  def unescapeHtmlEntities(text: Column): Column =
    replaceChain(text, htmlEntityTable)

  /** Repair the pinned mojibake digraphs ([[mojibakeTable]]). */
  def fixMojibake(text: Column): Column =
    replaceChain(text, mojibakeTable)

  /** Web-text cleanup for scraped corpora: strip HTML (script/style
    * contents dropped, tags → spaces), unescape the pinned entity set,
    * repair common UTF-8-as-cp1252 mojibake, collapse whitespace, trim.
    * Entirely codegen'd builtins (regexp_replace + replace chains) —
    * a narrow per-row projection with zero shuffle, and every step
    * replays verbatim in SQL (the q_web_clean oracle is GENERATED from
    * the same tables). */
  def webClean(text: Column): Column =
    trim(regexp_replace(
      fixMojibake(unescapeHtmlEntities(stripHtml(text))), "\\s+", " "))

  /** DuckDB twin of [[webClean]] as a SQL expression over `inner` —
    * generated from the SAME tables and regexes, so the oracle cannot
    * drift from the implementation. */
  def webCleanSql(inner: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val stripped =
      s"regexp_replace(regexp_replace($inner, " +
        s"'(?s)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g'), " +
        s"'<[^>]*>', ' ', 'g')"
    val chained = (htmlEntityTable ++ mojibakeTable)
      .foldLeft(stripped) { case (acc, (from, to)) =>
        s"replace($acc, ${q(from)}, ${q(to)})" }
    s"trim(regexp_replace($chained, '\\s+', ' ', 'g'))"
  }

  /** Unicode normalization (NFC/NFKC/NFD/NFKD) via the native codegen'd
    * [[graft.plans.UnicodeNormalizeExpression]] — zero-copy on ASCII and
    * already-normal inputs. The session must carry GraftExtensions;
    * callers go through query helpers or operators that register it. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    call_function("unicode_normalize", text, lit(form))

  /** Character n-gram shingle set (distinct, lowercased, whitespace
    * normalized) — input to MinHash/Jaccard. */
  /** Kernel: distinct character n-grams of the whitespace-normalized,
    * lowercased text, first-occurrence order.
    *
    * Deliberately a Scala kernel, not a higher-order-function expression:
    * Spark evaluates non-attribute subexpressions INSIDE a `transform`
    * lambda once per array element (no CSE in interpreted HOF eval), so an
    * expression form re-ran the normalization regex ~length times per
    * document — measured ~6 s for 6k docs vs milliseconds here.
    */
  /** SQL-compatible trim: spaces only, like Spark's trim() and DuckDB's
    * trim() — Java String.trim also strips tabs/newlines and would make
    * the kernels diverge from the Column/oracle forms on texts with edge
    * control whitespace. */
  private def sqlTrim(s: String): String =
    s.replaceAll("\\A +", "").replaceAll(" +\\z", "")

  def charShingleKernel(text: String, n: Int): Seq[String] = {
    if (text == null) return Seq.empty
    val norm = sqlTrim(text).toLowerCase.replaceAll("\\s+", " ")
    if (norm.length < n) return Seq.empty
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i <= norm.length - n) { out += norm.substring(i, i + n); i += 1 }
    out.toSeq
  }

  /** Kernel: distinct word n-grams, first-occurrence order. */
  def wordShingleKernel(text: String, n: Int): Seq[String] = {
    if (text == null) return Seq.empty
    // split with limit -1: Java's default split DROPS trailing empty
    // tokens while DuckDB's string_split keeps them — a doc ending in
    // '\t'/'\n' (which survives SQL trim) must tokenize identically on
    // both sides or the oracle twins mint an extra trailing gram
    // (review finding r10; the leading-empty side was already kept by
    // both). A blanket empty-token filter would equally diverge.
    val toks = sqlTrim(text).toLowerCase.replaceAll("\\s+", " ")
      .split(" ", -1)
    // whitespace-only/empty doc: split of "" is Array("") and n = 1
    // minted a ghost "" shingle (KernelProperties caught it); no
    // oracle shingles at n = 1, so the guard is Spark-API-only
    if (toks.length == 1 && toks(0).isEmpty) return Seq.empty
    if (toks.length < n) return Seq.empty
    val out = new scala.collection.mutable.LinkedHashSet[String]
    var i = 0
    while (i <= toks.length - n) {
      out += toks.slice(i, i + n).mkString(" ")
      i += 1
    }
    out.toSeq
  }

  private val charShinglesUdf = udf(charShingleKernel _)
  private val wordShinglesUdf = udf(wordShingleKernel _)

  def shingles(text: Column, n: Int = 5): Column =
    charShinglesUdf(text, lit(n))

  /** Word n-gram shingles (distinct) — unit for n-gram Jaccard. */
  def wordShingles(text: Column, n: Int = 3): Column =
    wordShinglesUdf(text, lit(n))
}
