package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{Hashing, TextFunctions}
import graft.operators.WordPiece

/** Property-based checks (ScalaCheck) for the pure JVM kernels —
  * total invariants that hold for EVERY input, complementing the
  * example-based specs: segmentation lossless-or-UNK, shingle shape,
  * hash range. Spark-level operators are covered by their oracle
  * queries and example specs; these kernels are the pieces that run
  * millions of times per partition, where an edge case is a silent
  * corpus-wide corruption. */
object KernelProperties extends Properties("graft.kernels") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  property("wordpiece: full single-char vocab reassembles every word") =
    forAll(word) { w =>
      val vocab = w.toSet.flatMap((c: Char) =>
        Set(c.toString, "##" + c))
      val ps = WordPiece.segment(w, vocab)
      val rebuilt = ps.map(_.replaceFirst("^##", "")).mkString
      rebuilt == w &&
        !ps.head.startsWith("##") &&
        ps.tail.forall(_.startsWith("##")) &&
        ps.length <= w.length
    }

  property("wordpiece: any unreachable position UNKs the whole word") =
    forAll(word) { w =>
      // drop the word-initial form of the first char: position 0 can
      // never match (continuation forms don't apply there)
      val vocab = w.toSet.flatMap((c: Char) =>
        Set(c.toString, "##" + c)) - w.head.toString
      WordPiece.segment(w, vocab) == Seq(WordPiece.Unk)
    }

  property("wordpiece: greedy consumes maximally at each step") =
    forAll(word) { w =>
      // vocab = every substring piece of the word: greedy must take
      // the whole word (or the max piece length) in one bite
      val vocab = (for {
        p <- 0 until w.length
        l <- 1 to math.min(WordPiece.MaxPieceLen, w.length - p)
      } yield (if (p > 0) "##" else "") + w.substring(p, p + l)).toSet
      val ps = WordPiece.segment(w, vocab)
      ps.length == math.ceil(
        w.length.toDouble / WordPiece.MaxPieceLen).toInt
    }

  private val text: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    ws <- Gen.listOfN(n, word)
    sep <- Gen.oneOf(" ", "  ", " \t ", "\n")
    lead <- Gen.oneOf("", "\t", "\n ")  // leading/trailing non-space
    trail <- Gen.oneOf("", "\n", " \t") // whitespace survives SQL trim
  } yield lead + ws.mkString(sep) + trail

  property("word shingles: distinct, exactly n tokens, bounded count") =
    forAll(text, Gen.chooseNum(1, 4)) { (t, n) =>
      val sh = TextFunctions.wordShingleKernel(t, n)
      // reference tokenization mirrors the kernel's contract exactly:
      // SQL-style trim (spaces only), collapse, split KEEPING empty
      // edge tokens (string_split parity), whitespace-only -> none
      val norm = t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ')
        .reverse.toLowerCase.replaceAll("\\s+", " ")
      val tokens =
        if (norm.isEmpty) Array.empty[String] else norm.split(" ", -1)
      sh.distinct == sh &&
        sh.forall(s => s.split(" ", -1).length == n) &&
        sh.length <= math.max(0, tokens.length - n + 1)
    }

  property("md5Long56Local: non-negative, below 2^56, deterministic") =
    forAll(Gen.asciiPrintableStr) { s =>
      val h = Hashing.md5Long56Local(s)
      h >= 0L && h < (1L << 56) && h == Hashing.md5Long56Local(s)
    }

  // -------------------------------------------------------------------
  // Overflow/magnitude bounds for the quantize-then-sum family (r10
  // verdict #4): each property names the operator's safe row/magnitude
  // bound and checks the arithmetic that carries it. Context: Spark 4
  // runs ANSI mode by default, so a long sum that DOES wrap raises an
  // error rather than silently corrupting — these bounds say where that
  // error becomes reachable.
  // -------------------------------------------------------------------

  /** Mirror of Downsample.ewmaQuantized's integer fold: e₁ = x₁,
    * eₜ = (num·xₜ + (den−num)·eₜ₋₁) div den (truncating division,
    * matching Spark's sign-carrying %). */
  private def ewmaMirror(xs: List[Long], num: Long, den: Long): List[Long] =
    xs match {
      case Nil => Nil
      case h :: t =>
        t.scanLeft(h) { (prev, x) =>
          val s = num * x + (den - num) * prev
          (s - s % den) / den
        }
    }

  property("ewmaQuantized: never amplifies — |e| ≤ max|x|, so the fold " +
      "is wrap-free for |x_milli| ≤ Long.Max/den (9.2·10^17 at den=10)") =
    forAll(
      Gen.nonEmptyListOf(Gen.chooseNum(-1000000000000000L, 1000000000000000L)),
      Gen.chooseNum(1L, 999L)) { (xs, num0) =>
      val den = 1000L
      val num = num0 // 0 < num < den
      val es = ewmaMirror(xs, num, den)
      val bigEs = xs.tail.scanLeft(BigInt(xs.head)) { (prev, x) =>
        val s = BigInt(num) * x + BigInt(den - num) * prev
        (s - s % den) / den
      }
      val maxAbs = xs.map(math.abs).max
      // exactness vs BigInt (no intermediate wrapped) AND containment
      es.map(BigInt(_)) == bigEs && es.forall(e => math.abs(e) <= maxAbs)
    }

  property("hll: harmonic denominator is structurally ≤ m·2^45 = 2^57 " +
      "at ANY corpus size (registers are maxes, not sums)") =
    forAll(Gen.listOf(Gen.chooseNum(0, 45))) { minLens =>
      // per-bucket register weight 2^min_len ≤ 2^45; ≤ 4096 buckets
      val regs = minLens.take(4096)
      val sPresent = regs.map(l => 1L << l).sum
      val sScaled = sPresent + (4096L - regs.size) * (1L << 45)
      // shard merge is min(min_len) per bucket — the merged register's
      // weight 2^min(a,b) ≤ 2^a, so merging can only shrink the sum and
      // the 2^57 ceiling holds for any number of merged shards
      sScaled > 0 && sScaled <= (1L << 57) &&
        regs.forall(a => regs.forall(b =>
          (1L << math.min(a, b)) <= (1L << a)))
    }

  property("psi: per-bucket nano term ≤ ~2·ln(n+10)·10^9, so a type's " +
      "10-bucket sum sits ≥ 10^7× below Long.Max at any row count") =
    forAll(Gen.chooseNum(0L, Long.MaxValue / 4),
      Gen.chooseNum(0L, Long.MaxValue / 4),
      Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) { (na, nb, fa, fb) =>
      val ca = (na * fa).toLong.min(na)
      val cb = (nb * fb).toLong.min(nb)
      val pa = (ca + 1).toDouble / (na + 10)
      val pb = (cb + 1).toDouble / (nb + 10)
      val term = (pa - pb) * math.log(pa / pb)
      val termNano = math.floor(term * 1e9)
      val bound = 2.0 * math.log(math.max(na, nb).toDouble + 10.0) * 1e9 + 1e9
      // term is non-negative ((p−q)·ln(p/q) ≥ 0) and log-bounded: the
      // 10-bucket per-type sum can never approach 2^63 — the PSI query
      // is overflow-free for any achievable table size
      termNano >= 0 && termNano <= bound
    }

  property("kn/logprob: cq = floor(ln(p)·10^6) ≥ −43.8·10^6 for any " +
      "representable p = k/n, so the corpus sum is wrap-free below " +
      "~2.1·10^11 grams (ANSI errors past it, never silent)") =
    forAll(Gen.chooseNum(1L, Long.MaxValue / 2),
      Gen.chooseNum(1L, Long.MaxValue / 2)) { (k0, n0) =>
      val n = math.max(k0, n0)
      val k = math.min(k0, n0) // 1 ≤ k ≤ n
      val p = k.toDouble / n
      val cq = math.floor(math.log(p) * 1e6).toLong
      // ln(1/2^63) ≈ −43.67; quantized floor ≥ −43.8e6
      cq <= 0 && cq >= -43800000L &&
        Long.MaxValue / 43800000L > 210000000000L // the named row bound
    }

  property("morton 2D: interleave of xq,yq < 2^bits lands in [0, 2^(2·bits)) " +
      "— bits ≤ 20 (quantize's require) keeps 2·20 = 40 result bits; the " +
      "N-dim variant requires bits·dims ≤ 62 in code") =
    forAll(Gen.chooseNum(1, 20).flatMap(b =>
      Gen.zip(Gen.const(b), Gen.chooseNum(0L, (1L << b) - 1),
        Gen.chooseNum(0L, (1L << b) - 1)))) { case (bits, xq, yq) =>
      // bit-for-bit mirror of Layout.mortonZ's expression tree
      val z = (0 until bits).map { i =>
        (((xq >> i) & 1L) << (2 * i + 1)) | (((yq >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
      z >= 0 && z < (1L << (2 * bits))
    }

  property("pagerank nanos: within the required 10^9-node bound the seed " +
      "is ≥ 1 nano and total mass never exceeds 10^9 (no wrap at any " +
      "iteration count)") =
    forAll(Gen.chooseNum(1L, 1000000000L)) { n =>
      val pr0 = 1000000000L / n
      val baseNanos = 3L * 1000000000L / 20L / n
      // seed resolution holds exactly up to the require()'d bound;
      // conservation: Σ pr ≤ n·pr0 ≤ 10^9 initially and each iteration
      // maps mass m → base + 17/20·m ≤ 10^9 when m ≤ 10^9
      pr0 >= 1L && n * pr0 <= 1000000000L &&
        n * baseNanos + 17L * 1000000000L / 20L <= 1000000000L
    }
}
