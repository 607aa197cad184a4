package graft.score

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static-forwarder host for generated code ( `graft.score.JaroWinklerImpl
  * .sim(a, b)` is emitted verbatim into whole-stage-codegen Java). */
object JaroWinklerImpl {
  def sim(a: UTF8String, b: UTF8String): Double =
    Similarity.jaroWinkler(a.toString, b.toString)
}

/**
 * Native Catalyst expression for Jaro-Winkler similarity — the scoring
 * stage's hottest scalar (evaluated once per candidate pair; 30M+ pairs
 * per run at bench scale). A `udf()` here forces an encoder boundary per
 * row and blocks expression-level codegen; this BinaryExpression stays
 * inside the whole-stage-codegen loop and compiles to a static call
 * (`defineCodeGen`), the same pattern as Spark's own `Levenshtein`.
 *
 * Null semantics: BinaryExpression's default eval returns null when
 * either side is null (nullSafeEval only sees non-null inputs).
 */
object JaroWinklerExpr {
  /** Registry builder with arity validation: a SQL call like
    * `jaro_winkler(a)` must fail as an analysis error, not an
    * IndexOutOfBoundsException from children(1). */
  def build(children: Seq[Expression]): JaroWinklerExpr = {
    if (children.size != 2) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`jaro_winkler`",
          "expectedNum" -> "2",
          "actualNum" -> children.size.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    }
    JaroWinklerExpr(children(0), children(1))
  }
}

case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.sim(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.score.JaroWinklerImpl.sim($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}
