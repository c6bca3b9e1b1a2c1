package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native kernels for the q52 SRP-sketch ANN hot path (SURVEY.md §2.2
  * Q41): the sign-random-projection signature (SigBits × dim
  * multiply-adds per row) and signature Hamming distance. The HOF
  * formulations in Similarity.scala evaluate interpreted lambdas per
  * plane×dimension — ~1.5 ms/vector at 256×64 — where these run the
  * same arithmetic as a primitive loop. Bit-parity with the HOF (and so
  * with the DuckDB oracle) is asserted in AnnRecallSpec.
  */
object SrpKernels {

  private final val M = 2147483647L

  /** Plane component for flat index `idx`: the same quadratic
    * congruential mixer as Similarity.planeSql — *, +, % only, exact
    * BIGINT arithmetic, mapped to [-1, 1).
    */
  private def plane(idx: Long): Double = {
    val h1 = (idx * 2654435761L + 123456789L) % M
    val h2 = (h1 * h1 % M + h1) % M
    val h3 = (h2 * h2 % M + idx) % M
    (h3.toDouble / 2147483647.0) * 2 - 1
  }

  /** SigBits-bit SRP signature of an array<double>. HOF parity: a NULL
    * element poisons every plane's left-fold, and `CASE WHEN null > 0`
    * takes the ELSE branch — so the HOF yields all-zero bits; this does
    * too.
    */
  def srpSignature(v: ArrayData, bits: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Int](bits)
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return new GenericArrayData(out); i += 1 }
    val xs = new Array[Double](n)
    i = 0
    while (i < n) { xs(i) = v.getDouble(i); i += 1 }
    var p = 0
    while (p < bits) {
      var s = 0.0
      var j = 0
      while (j < n) { s += xs(j) * plane(p.toLong * n + j); j += 1 }
      out(p) = if (s > 0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Count of differing slots between two equal-length array<int>. */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var d = 0
    var i = 0
    while (i < n) { if (a.getInt(i) != b.getInt(i)) d += 1; i += 1 }
    d
  }
}

/** v array<double> → array<int> of SigBits sign bits. `bits` must be an
  * int literal (it sizes the output at plan time).
  */
case class SrpSignature(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_srpsig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if bits > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, bits > 0), got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SrpKernels.srpSignature(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.SrpKernels.srpSignature($in, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SrpSignature =
    copy(child = newChild)
}

/** (a, b) array<int> → INT Hamming distance; NULL on length mismatch
  * (the zip_with formulation's null-padded fold also degenerates there —
  * signatures are fixed-width by construction, so the branch is a
  * type-safety guard, not a hot path).
  */
case class HammingDistance(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hamming"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(IntegerType, false) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> (containsNull=false) arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else SrpKernels.hamming(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
       |if ($a.numElements() != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.functions.SrpKernels.hamming($a, $b);
       |}
     """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}
