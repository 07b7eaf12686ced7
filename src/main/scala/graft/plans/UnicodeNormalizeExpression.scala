package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFKC/NFD/NFKD) as a native codegen'd
  * expression — the first step of every serious text-cleaning pipeline
  * (C4 §2.2 and CCNet both normalize before filtering; fingerprint-based
  * dedup is wrong without it, since "é" and "e"+U+0301 hash apart while
  * rendering identically).
  *
  * Custom-`Expression` tier (same ladder as [[ParsePositionExpression]]):
  * no encoder round-trip, stays inside whole-stage codegen, and takes a
  * zero-copy fast path — a full-ASCII input (the overwhelming majority of
  * web text bytes) is returned AS-IS without materializing a String, and
  * a non-ASCII input that is already in the requested form (checked via
  * `java.text.Normalizer.isNormalized`, the quick-check algorithm of
  * UAX #15) skips the rebuild too. Only genuinely denormalized rows pay
  * the normalize + re-encode cost. Narrow per-row op — no shuffle.
  *
  * The NFC form is oracle-checked cross-engine (q_nfc_normalize replays
  * through DuckDB's utf8proc-backed `nfc_normalize`, a JDK-vs-ICU
  * implementation parity gate); NFKC/NFD/NFKD have no DuckDB twin and are
  * spec-gated on published examples (ligatures, fullwidth forms,
  * compatibility digits).
  */
case class UnicodeNormalizeExpression(child: Expression, formIdx: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize expects STRING, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpression.normalize(
      input.asInstanceOf[UTF8String], formIdx)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = UnicodeNormalizeExpression.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = $cls.normalize($c, $formIdx);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UnicodeNormalizeExpression {
  import java.text.Normalizer
  private val forms = Array(Normalizer.Form.NFC, Normalizer.Form.NFKC,
    Normalizer.Form.NFD, Normalizer.Form.NFKD)

  def formIndex(name: String): Int = name.toUpperCase match {
    case "NFC"  => 0
    case "NFKC" => 1
    case "NFD"  => 2
    case "NFKD" => 3
    case other => throw new IllegalArgumentException(
      s"unknown normalization form '$other' (NFC|NFKC|NFD|NFKD)")
  }

  /** Static entry shared by interpreted eval and generated code.
    * Zero-copy when the input is full ASCII or already normalized. */
  def normalize(raw: UTF8String, formIdx: Int): UTF8String = {
    if (raw == null) return null
    // ASCII is invariant under all four forms: no String materialization
    if (raw.isFullAscii) return raw
    val s = raw.toString
    val form = forms(formIdx)
    if (Normalizer.isNormalized(s, form)) raw
    else UTF8String.fromString(Normalizer.normalize(s, form))
  }
}
