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
}
