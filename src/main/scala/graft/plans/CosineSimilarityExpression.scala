package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense-vector scalar kernel for the codegen'd cosine expression.
  * Top-level object ⇒ scalac emits a static forwarder, so generated
  * Java can call `graft.plans.CosineOps.cosine(a, b)` directly. The
  * accumulation order is left-to-right — the SAME order as the
  * `aggregate(zip_with(...))` higher-order-function chain it
  * replaces, so results are bit-identical and every existing oracle
  * (q16/q87) holds unchanged. */
object CosineOps {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // norms cover the FULL vectors (zip_with null-pads the shorter
    // side, so the OLD chain's dot — hence its whole result — was NULL
    // for ragged inputs; this expression instead returns a finite
    // number: dot over min length, norms over full vectors.
    // Bit-identity with the old chain therefore holds for EQUAL-length
    // vectors only — which every current call site guarantees)
    var j = n
    while (j < a.numElements()) { val x = a.getDouble(j); na += x * x; j += 1 }
    var k = n
    while (k < b.numElements()) { val y = b.getDouble(k); nb += y * y; k += 1 }
    dot / math.sqrt(na * nb)
  }
}

/** cosine(array<double>, array<double>) as a native codegen'd
  * expression — the ANN/few-shot hot scalar. The higher-order spelling
  * `aggregate(zip_with(v, q, (x,y) -> x*y), 0D, (acc,w) -> acc+w)`
  * materializes the element-wise product ARRAY per row before
  * reducing it (an allocation + copy per vector per candidate); this
  * expression is one fused loop over both ArrayData buffers, called
  * statically from generated code (the jaro_winkler pattern,
  * JaroWinklerExpression.scala). NaN on zero-norm inputs, exactly as
  * the higher-order chain (0/0). */
case class CosineSimilarityExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    CosineOps.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.CosineOps.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityExpression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarityExpression {
  val ident: FunctionIdentifier = FunctionIdentifier("cosine_sim")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimilarityExpression].getCanonicalName, "cosine_sim")
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"cosine_sim expects 2 arguments, got ${exprs.length}")
    CosineSimilarityExpression(exprs(0), exprs(1))
  }
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cosine_sim", builder, "built-in")
}
