package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the dedup hot path (SURVEY.md §2.2 Q40),
  * registered by [[graft.plans.GraftExtensions]]. Codegen emits a single
  * static call into [[TextKernels]] — no per-element interpreted
  * lambdas, which is what makes shingling the dominant cost of the HOF
  * formulation at scale.
  */

/** text STRING → array<string> of distinct word 3-shingles. */
case class Shingles3(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles3"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.shingles3($in)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** (text STRING, k literal INT) → array<string> of distinct word
  * k-shingles — the width-generic [[Shingles3]] (q110/q95/q100 widths;
  * the pinned 3-gram dedup hot path keeps its own kernel).
  */
case class ShinglesK(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, k > 0), got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.shinglesK(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.shinglesK($in, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesK =
    copy(child = newChild)
}

/** text STRING → array<long> of distinct word k-shingles hashed to
  * their 60-bit md5 prefix — [[ShinglesK]] ∘ [[Hash60]] fused (see
  * [[TextKernels.shinglesKH60]]; the [[Shingles3H60]] design at
  * arbitrary k, for q110's source-overlap index).
  */
case class ShinglesKH60(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles_h60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, k > 0), got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.shinglesKH60(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.shinglesKH60($in, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesKH60 =
    copy(child = newChild)
}

/** text STRING → array<struct<i: int, h: bigint>> of winnowing-anchored
  * span windows (see [[TextKernels.spanWindows]]): anchor positions and
  * 60-bit window hashes in one codegen'd pass, replacing an interpreted
  * per-token-position md5 filter HOF.
  */
case class SpanWindowsExpr(child: Expression, spanTokens: Int, anchorMod: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_span_windows"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && spanTokens > 0 && anchorMod > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, spanTokens > 0, anchorMod > 0), " +
        s"got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.spanWindows(input.asInstanceOf[UTF8String], spanTokens, anchorMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.TextKernels.spanWindows($in, $spanTokens, $anchorMod)")

  override protected def withNewChildInternal(newChild: Expression): SpanWindowsExpr =
    copy(child = newChild)
}

/** toks array<string> → BIGINT Σ vocab.getOrElse(token, dflt) — the
  * bounded-vocab fold (see [[TextKernels.vocabSum]]). keys/vals/dflt
  * are extracted from foldable literals by the registry builder at
  * plan build (the intLit pattern), so each row pays only the fold.
  * Array-typed fields compare by reference, so two structurally-equal
  * instances miss subexpression elimination — harmless (distinct vocab
  * maps anyway) but worth knowing.
  */
case class VocabSum(child: Expression, keys: Array[UTF8String],
                    vals: Array[Long], dflt: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_vocab_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> tokens, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.vocabSum(input.asInstanceOf[ArrayData], keys, vals, dflt)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("keys", keys)
    val v = ctx.addReferenceObj("vals", vals)
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.TextKernels.vocabSum($in, $k, $v, ${dflt}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabSum =
    copy(child = newChild)
}

/** text STRING → BIGINT SimHash fingerprint (zero-shuffle form of the
  * token/bit group-by formulation).
  */
case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.simhash($in)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** text STRING → BIGINT 60-bit parity hash (q43's inverted-index key —
  * the byte-level form of `conv(substring(md5(x),1,15),16,10)`).
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.hash60($in)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

/** text STRING → array<long> of distinct word 3-shingles hashed to
  * their 60-bit md5 prefix — [[Shingles3]] ∘ [[Hash60]] fused so the
  * dedup hot path (q41/q43/q143/q106) never materializes shingle
  * STRINGS into the exploded stream and digests each shingle exactly
  * once (round-18 verdict #5). Dedup is on the string (denominator
  * parity), hashing after — see TextKernels.shingles3H60.
  */
case class Shingles3H60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles3_h60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles3H60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.shingles3H60($in)")

  override protected def withNewChildInternal(newChild: Expression): Shingles3H60 =
    copy(child = newChild)
}

/** hashed shingles array<long> ([[Shingles3H60]] output) → array<long>
  * MinHash signature (32 perms) — [[MinHashSig]] over pre-hashed
  * shingles, so signature and verification set share one md5 pass.
  */
case class MinHashSigH60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_h60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSigH60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.minhashSigH60($in)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigH60 =
    copy(child = newChild)
}

/** array<T> (a sorted dedup bucket) → array<struct<a: T, b: T>> of all
  * ordered pairs (i < j, row-major) — [[TextKernels.sortedPairs]] as a
  * codegen'd expression. Replaces the flatten∘transform∘slice HOF chain
  * in the dedup family's pair generator: HigherOrderFunctions are
  * CodegenFallback, so the bucket→pairs stage (the family's dominant
  * compute — k(k−1)/2 rows per bucket) paid interpreted lambda dispatch
  * and per-element slice allocations per posting. Output is
  * bit-identical by construction (same pair set, order, and element
  * values).
  */
case class SortedPairsExpr(child: Expression) extends UnaryExpression {
  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType, elemNullable),
    StructField("b", elemType, elemNullable))), containsNull = false)
  override def prettyName: String = "graft_pairs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array argument, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.sortedPairs(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType)
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.TextKernels.sortedPairs($in, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedPairsExpr =
    copy(child = newChild)
}

/** shingles array<string> → array<long> MinHash signature (32 perms). */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.TextKernels.minhashSig($in)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Binary-search membership of a long in a SORTED-ascending array<long>
  * — the probe for bounded fitted sets shipped as array literals (the
  * q247 boilerplate line-hash artifact): `array_contains` scans the
  * whole literal per row, this is log2(n) long compares. The sort
  * order is the CALLER's contract (Pipeline.scrubLines sorts the
  * artifact before building the literal); an unsorted array returns
  * arbitrary wrong answers, exactly like Arrays.binarySearch.
  */
case class SortedContains(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sorted_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, bigint), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(a: Any, v: Any): Any =
    TextKernels.sortedContains(a.asInstanceOf[ArrayData], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, v) =>
      s"graft.functions.TextKernels.sortedContains($a, $v)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedContains = copy(left = l, right = r)
}
