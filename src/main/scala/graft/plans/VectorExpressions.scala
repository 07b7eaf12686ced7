package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector math on the similarity /
  * ANN / embedding-dedup paths.
  *
  * The composed-builtin forms (`aggregate(zip_with(...))` in
  * [[graft.operators.SimilaritySearch]]) are semantically right but
  * Spark's higher-order functions are CodegenFallback — every element
  * round-trips through interpreted lambda eval, and a `bits`-plane LSH
  * signature re-walks the array `bits` times. These expressions keep the
  * whole inner loop in one generated-code static call: one pass for
  * cosine (dot + both norms), one pass per plane with an inlined xxhash
  * for the signature.
  *
  * Bit-compatibility contract: both kernels accumulate in the same
  * element order and with the same operation sequence as the HOF forms
  * they replace, so swapping them cannot change any oracle-compared
  * value (VectorKernelSpec pins native == HOF exactly).
  */
case class CosineSimilarityExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_cosine expects (array<double>, array<double>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosineBoxed(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = $cls.cosineBoxed($a, $b);
         |${ev.isNull} = ${ev.value}_r == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : ${ev.value}_r.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `vec_dot(a, b)`: raw inner product — the MIPS ranking score
  * (dot-product retrievers score q·x, not cosine: document norm carries
  * trained signal there, so the two orderings genuinely differ). Same
  * null semantics and accumulation order as the zip_with/aggregate HOF
  * twin and as DuckDB's sequential `list_inner_product`, which is what
  * makes the q_mips oracles exact. */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dotBoxed(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double ${ev.value}_r = $cls.dotBoxed($a, $b);
         |${ev.isNull} = ${ev.value}_r == null;
         |${ev.value} = ${ev.isNull} ? 0.0 : ${ev.value}_r.doubleValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** `lsh_signature(vec, bits)`: `bits`-bit random-hyperplane signature,
  * hyperplane components derived from the same xxhash64 stream as the HOF
  * form ([[graft.operators.SimilaritySearch.lshSignatureHof]]). */
case class LshSignatureExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"lsh_signature expects (array<double>, int), got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def nullSafeEval(v: Any, bits: Any): Any =
    VectorKernels.lshSignature(
      v.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = VectorKernels.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (v, b) => s"$cls.lshSignature($v, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorKernels {

  /** Cosine of two double arrays; one pass, same accumulation order as
    * the sequential HOF sums. Null on length mismatch (the zip_with form
    * yields a null sum there); 0.0 when either norm is 0. */
  def cosineBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      // null elements: the HOF form's sum goes null — mirror that
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val norm = math.sqrt(na) * math.sqrt(nb)
    if (norm == 0.0) 0.0 else dot / norm
  }

  /** Inner product of two double arrays, sequential accumulation (the
    * HOF-twin / DuckDB `list_inner_product` order). Null on length
    * mismatch or any null element — mirror of the zip_with form. */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }

  /** Hyperplane component (p, j) in [-1, 1): the same
    * `pmod(xxhash64(p, j), 1e6) / 5e5 - 1` stream as the HOF form —
    * xxhash64 seed 42, int inputs hashed in argument order. */
  @inline private def planeComponent(p: Int, j: Int): Double = {
    val h = XXH64.hashInt(j, XXH64.hashInt(p, 42L))
    val m = ((h % 1000000L) + 1000000L) % 1000000L
    m.toDouble / 500000.0 - 1.0
  }

  /** `bits`-bit sign-of-projection signature, one array pass per plane in
    * element order (bit p set when the projection is >= 0). */
  def lshSignature(v: ArrayData, bits: Int): Long = {
    val n = v.numElements()
    // empty vector: the HOF twin's aggregate sum is null and every
    // when(proj >= 0, ...) falls to otherwise(0) — signature 0, not all-1s
    if (n == 0) return 0L
    var sig = 0L
    var p = 0
    while (p < bits) {
      var proj = 0.0
      var j = 0
      while (j < n) {
        proj += v.getDouble(j) * planeComponent(p, j)
        j += 1
      }
      if (proj >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Column forms via the registered SQL functions
    * (see [[GraftExtensions]]). */
  def cosineNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_cosine", a, b)

  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  def lshSignatureNative(v: Column, bits: Int): Column =
    org.apache.spark.sql.functions.call_function("lsh_signature", v,
      org.apache.spark.sql.functions.lit(bits))
}
