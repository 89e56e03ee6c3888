package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.{Cbor, NaturalOrder}

/** Native Catalyst expressions for the engine's two hot scalar
  * functions (SURVEY §4 candidate b): a ScalaUDF costs a
  * serialization boundary and blocks whole-stage codegen fusion; these
  * generate a direct static call inside the produced Java, so sorts and
  * projections over them stay in one codegen span.
  */
case class NaturalKeyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "natural_key"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(NaturalOrder.naturalKey(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.NaturalOrder.naturalKey($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): NaturalKeyExpr =
    copy(child = newChild)
}

/** 64-hex content hash of a stored CBOR value column — the same
  * function the commit path computes, exposed to SQL/DataFrame plans
  * (e.g. integrity re-checks over a whole collection as one scan). */
case class ContentHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "content_hash"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Cbor.hashOfEncoded(input.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.Cbor.hashOfEncoded($c))")
  override protected def withNewChildInternal(newChild: Expression): ContentHashExpr =
    copy(child = newChild)
}

/** Unicode NFC normalization (canonical composition) as a native
  * expression — the first pass of any multilingual corpus scrub
  * (decomposed accent sequences and singleton variants otherwise make
  * byte-equal-looking strings hash and dedup differently).
  * `java.text.Normalizer` is JDK-built-in and matches DuckDB's
  * `nfc_normalize` (both implement UAX #15), so results are
  * oracle-checkable cross-engine. The already-normalized fast path
  * (`isNormalized`, an O(n) scan with no allocation) makes the common
  * ASCII case nearly free. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      GraftFunctions.nfc(input.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.expressions.GraftFunctions.nfc($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** floor(2^8 · log2(x)) of a positive Long in exact integer arithmetic
  * (binary logarithm by squaring, 8 fractional bits) — the fixed-point
  * log the DSIR importance weights ([[graft.ops.Importance]]) sum, so
  * scores are bit-equal on any engine with integer multiply and shift.
  * A native expression rather than composed column arithmetic because
  * the 8-step recurrence references its mantissa ~8× per step: as a
  * column-expression fold the tree grows ~8^8 nodes and OOMs the
  * driver during optimization; here it is ONE node generating a tight
  * static call. Domain 1 ≤ x < 2^46 (the 2^17 normalizer must stay in
  * Long) — enforced, since a silent wrap would desync from the oracle. */
case class FixLog2Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "fix_log2"
  override protected def nullSafeEval(input: Any): Any =
    GraftFunctions.fixLog2(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GraftFunctions.fixLog2($c)")
  override protected def withNewChildInternal(newChild: Expression): FixLog2Expr =
    copy(child = newChild)
}

/** 2-D Hilbert-curve index of pre-quantized (x, y) ∈ [0, 2^bits)² —
  * the locality-preserving layout key ([[graft.ops.Layout.hilbertKey]]).
  * Like [[FixLog2Expr]], a native expression rather than composed
  * column arithmetic: the per-level rotation rewrites x and y from
  * BOTH previous values, so a column-expression unroll doubles the
  * tree each of the `bits` levels; here it is ONE node generating a
  * tight static loop. Out-of-domain inputs throw (a silent wrap would
  * desync the layout from the oracle's unrolled-CTE twin). */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "hilbert_index"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    GraftFunctions.hilbertIndex(x.asInstanceOf[Long], y.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.GraftFunctions.hilbertIndex($a, $b, $bits)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndexExpr =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {

  /** Static helper the codegen'd `hilbert_index` calls: the standard
    * iterative xy→d walk (level-by-level quadrant digit + rotation),
    * top bit first. Domain: bits ∈ [1, 31], x and y ∈ [0, 2^bits). */
  def hilbertIndex(x0: Long, y0: Long, bits: Int): Long = {
    if (bits < 1 || bits > 31)
      throw new IllegalArgumentException(s"hilbert_index bits domain is [1, 31], got $bits")
    val n = 1L << bits
    if (x0 < 0 || x0 >= n || y0 < 0 || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert_index inputs must be in [0, $n): ($x0, $y0)")
    var x = x0; var y = y0; var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Static helper the codegen'd `fix_log2` calls: floor-truncated
    * 8.8 fixed-point log2. e is the binary digit count minus one
    * (identical to the oracle's `length(bin(x)) - 1`); the mantissa
    * m ∈ [2^17, 2^18) is squared 8 times, each step emitting the next
    * fractional bit and truncating — the same integer recurrence the
    * DuckDB oracle unrolls as CTEs. */
  def fixLog2(x: Long): Long = {
    if (x < 1L || x >= (1L << 46))
      throw new IllegalArgumentException(s"fix_log2 domain is [1, 2^46), got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = (x << 17) >> e
    var f = 0L
    var i = 0
    while (i < 8) {
      val sq = (m * m) >> 17
      if (sq >= 262144L) { f = f * 2 + 1; m = sq >> 1 }
      else { f = f * 2; m = sq }
      i += 1
    }
    (e.toLong << 8) + f
  }

  /** Static helper the codegen'd `nfc_normalize` calls. */
  def nfc(s: String): String =
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) s
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  /** Register natural_key / content_hash with the session's function
    * registry (idempotent) so `expr("natural_key(id)")` and SQL can use
    * them. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("natural_key"),
      new ExpressionInfo(classOf[NaturalKeyExpr].getName, "natural_key"),
      (exprs: Seq[Expression]) => NaturalKeyExpr(exprs.head))
    reg.registerFunction(
      FunctionIdentifier("content_hash"),
      new ExpressionInfo(classOf[ContentHashExpr].getName, "content_hash"),
      (exprs: Seq[Expression]) => ContentHashExpr(exprs.head))
    reg.registerFunction(
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProductExpr(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimExpr].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimExpr(exprs(0), exprs(1)))
    reg.registerFunction(
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalizeExpr].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalizeExpr(exprs.head))
    reg.registerFunction(
      FunctionIdentifier("fix_log2"),
      new ExpressionInfo(classOf[FixLog2Expr].getName, "fix_log2"),
      (exprs: Seq[Expression]) => FixLog2Expr(exprs.head))
  }

}
