package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro-Winkler / strcmp95 similarity
  * (the reference's entity-matching score, entityMatching.py:60-88;
  * scalar semantics live in [[graft.functions.StringSim.jaroWinkler]]
  * and are pinned by StringSimSpec's fixtures).
  *
  * Why an Expression and not the Scala UDF it replaces: a UDF is an
  * opaque lambda — Catalyst cannot see through it, every call crosses
  * the InternalRow↔Scala boundary (two UTF8String→String conversions
  * PLUS boxing a java.lang.Double per row), and a `ScalaUDF` node
  * breaks the WholeStageCodegen span it sits in. This expression
  * generates a direct static call inside the fused loop — the same
  * pattern as Spark's own `levenshtein`/`soundex` (a codegen'd call
  * into a library routine), so the theta-join stays one fused stage.
  * Null handling comes from BinaryExpression's null-safe contract. */
case class JaroWinklerExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  // ExpectsInputTypes.inputTypes names private[sql] AbstractDataType —
  // check manually instead
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    graft.functions.StringSim.jaroWinkler(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringSim.jaroWinkler($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpression {
  val ident: FunctionIdentifier = FunctionIdentifier("jaro_winkler")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[JaroWinklerExpression].getCanonicalName, "jaro_winkler")
  val builder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2, s"jaro_winkler expects 2 arguments, got ${exprs.length}")
    JaroWinklerExpression(exprs(0), exprs(1))
  }

  /** Idempotent per-session registration for sessions not built with
    * `spark.sql.extensions=graft.plans.GraftExtensions` (the driver
    * hands us its own session). After this, `expr("jaro_winkler(a,b)")`
    * resolves to the codegen'd expression in SQL and DataFrame code. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("jaro_winkler", builder, "built-in")
}

/** SparkSessionExtensions wiring (`--conf spark.sql.extensions=
  * graft.plans.GraftExtensions`): the production path that makes the
  * function available in every session of the application without
  * per-query registration. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((JaroWinklerExpression.ident,
      JaroWinklerExpression.info, JaroWinklerExpression.builder))
    ext.injectFunction((CosineSimilarityExpression.ident,
      CosineSimilarityExpression.info, CosineSimilarityExpression.builder))
    ext.injectFunction((SortedOverlapExpression.ident,
      SortedOverlapExpression.info, SortedOverlapExpression.builder))
  }
}
