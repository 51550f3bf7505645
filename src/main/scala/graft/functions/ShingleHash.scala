package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the word-n-gram hash stream — the hot
  * inner loop of the text dedup/sketch family (`TextOps.shingles(text, n)`
  * exploded through `TextOps.hash32`).
  *
  * Why native (r13, guide §4): the composed form is
  * `transform(sequence(1, m−n+1), i → concat_ws(" ", element_at…))` fed
  * into `conv(substring(md5(g),1,8),16,10)` — higher-order functions never
  * enter whole-stage codegen, so every gram walks an interpreted
  * expression tree, builds the gram STRING, hex-encodes a full md5 and
  * parses 8 hex chars back to a long. jstack sampling of the kmv rows
  * showed exactly those frames (`StringSplit.nullSafeEval`,
  * `ConcatWs.eval`) dominating their slow iterations. This expression
  * does one pass per row: the same whitespace split, then per gram one
  * md5 over the joined token bytes, taking the digest's first 4 bytes as
  * the unsigned 32-bit value — bit-identical to
  * `CAST('0x' || substr(md5(g),1,8) AS BIGINT)` (the first 8 hex chars
  * ARE the first 4 digest bytes, big-endian), so every oracle and every
  * downstream signature (minhash, KMV, containment) is unchanged.
  *
  * Semantics vs the composed form (`ShingleHashSpec` pins equality):
  *  - tokenization is the SAME regex split (`UTF8String.split(" ", -1)`)
  *    `TextOps.tokens` lowers to;
  *  - fewer than `n` tokens → empty array (the composed form's guard);
  *  - null text → null (composed form yields an empty array; every call
  *    site explodes the result, and explode/explode_outer treat null and
  *    empty identically).
  */
case class ShingleHash32(text: Expression, n: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = n

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType == StringType && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_hash32 expects (string, int literal)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash32"

  override def nullSafeEval(t: Any, nv: Any): Any =
    ShingleHash32.compute(t.asInstanceOf[UTF8String],
      nv.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, nv) =>
      s"${ev.value} = graft.functions.ShingleHash32.compute($t, $nv);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ShingleHash32 =
    copy(text = newLeft, n = newRight)
}

object ShingleHash32 {
  private val space = UTF8String.fromString(" ")
  private val spaceByte = ' '.toByte

  /** One row's gram hashes: split on the same " " regex the composed
    * form uses, md5 each n-token window's joined bytes, keep the first 4
    * digest bytes as an unsigned 32-bit value. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.split(space, -1)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i <= m - n) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(spaceByte)
        md.update(toks(i + k).getBytes)
        k += 1
      }
      val dig = md.digest()
      out(i) = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      i += 1
    }
    new GenericArrayData(out)
  }

  val ident: FunctionIdentifier = FunctionIdentifier("shingle_hash32")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[ShingleHash32].getName, "shingle_hash32")
  val builder: PartialFunction[Seq[Expression], Expression] = {
    case Seq(t, nv) => ShingleHash32(t, nv)
  }
}
