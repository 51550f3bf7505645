package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the exact integer inner product of two
  * `array<long>` columns — the hot inner loop of the entire similarity
  * family ([[graft.operators.VectorOps.dotL]]).
  *
  * Why native: the composed form `aggregate(zip_with(a, b, _*_), 0, _+_)`
  * runs as interpreted `HigherOrderFunction` lambdas — per element it
  * allocates/binds lambda variables and walks a small expression tree,
  * and it sits OUTSIDE whole-stage codegen. (The other alternative, a
  * 64-term unrolled `element_at` chain, measured 1.6× SLOWER than the
  * lambda — ~250 Catalyst nodes blow the codegen splitting thresholds;
  * see VectorOps. A custom expression is the documented preference
  * order's next step.) This expression compiles to one primitive `long`
  * loop over the two `ArrayData` (getLong is an offset read on the
  * unsafe format), participates in whole-stage codegen, and has an
  * equivalent interpreted path for non-codegen contexts.
  *
  * Semantics: length = min of the two lengths (the quantized-vector
  * frames are fixed-Dim by construction, so the min never bites); null
  * ARRAY input → null (like the lambda form). Array ELEMENTS are
  * non-null by construction (quantization maps non-null floats); a null
  * element would read as 0 here where the lambda form returns null — no
  * such arrays exist in this engine's stages, and `DotLongSpec` pins
  * lambda-equality on every shape that does.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  // AbstractDataType (ExpectsInputTypes' vocabulary) is private[sql] in
  // Spark 4, so third-party expressions type-check manually
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_long expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

object DotLong {
  val ident: FunctionIdentifier = FunctionIdentifier("dot_long")
  val info: ExpressionInfo =
    new ExpressionInfo(classOf[DotLong].getName, "dot_long")
  val builder: PartialFunction[Seq[Expression], Expression] = {
    case Seq(a, b) => DotLong(a, b)
  }
}
