package graft

import graft.plans.UnicodeNormalizeExpression
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class UnicodeNormalizeSpec extends AnyFunSuite {
  import SparkTestSession._

  private def norm(s: String, form: String): String = {
    val u = UnicodeNormalizeExpression.normalize(
      UTF8String.fromString(s), UnicodeNormalizeExpression.formIndex(form))
    if (u == null) null else u.toString
  }

  test("NFC composes combining sequences and singletons, keeps ligatures") {
    assert(norm("Cafe\u0301", "NFC") == "Caf\u00e9")
    // U+212B ANGSTROM SIGN is a singleton: NFC maps it to U+00C5
    assert(norm("\u212B", "NFC") == "\u00C5")
    // compatibility characters survive canonical composition
    assert(norm("\uFB01ne", "NFC") == "\uFB01ne")
  }

  test("NFKC additionally folds compatibility forms " +
      "(ligatures, fullwidth, superscripts)") {
    assert(norm("\uFB01ne", "NFKC") == "fine")
    assert(norm("\uFF21\uFF22", "NFKC") == "AB")
    assert(norm("x\u00B2", "NFKC") == "x2")
  }

  test("NFD decomposes; NFC(NFD(s)) == NFC(s); all forms idempotent") {
    assert(norm("Caf\u00e9", "NFD") == "Cafe\u0301")
    val mixed = "Cafe\u0301 \u212B na\u00EFve \uFB01ne plain ascii"
    for (f <- Seq("NFC", "NFKC", "NFD", "NFKD")) {
      assert(norm(norm(mixed, f), f) == norm(mixed, f), f)
    }
    assert(norm(norm(mixed, "NFD"), "NFC") == norm(mixed, "NFC"))
  }

  test("ASCII and already-normalized inputs are returned zero-copy") {
    val ascii = UTF8String.fromString("plain ascii only")
    assert(UnicodeNormalizeExpression.normalize(ascii, 0) eq ascii)
    val normal = UTF8String.fromString("Caf\u00e9") // already NFC
    assert(UnicodeNormalizeExpression.normalize(normal, 0) eq normal)
  }

  test("column form runs under codegen, matches the kernel, keeps nulls") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val rows = Seq((1L, "Cafe\u0301 \u212B"), (2L, "ascii"), (3L, null))
      .toDF("id", "s")
    val out = rows.select(col("id"),
        TextFunctions.unicodeNormalize(col("s"), "NFC").as("n"))
      .orderBy("id").collect()
    assert(out(0).getString(1) == "Caf\u00e9 \u00C5")
    assert(out(1).getString(1) == "ascii")
    assert(out(2).isNullAt(1))
    // SQL surface resolves too, and a non-literal form is rejected
    assert(spark.sql("SELECT unicode_normalize('Cafe\u0301', 'NFC')")
      .head().getString(0) == "Caf\u00e9")
    intercept[Exception] {
      spark.sql("SELECT unicode_normalize(s, s) FROM VALUES ('x') t(s)")
        .collect()
    }
  }
}
