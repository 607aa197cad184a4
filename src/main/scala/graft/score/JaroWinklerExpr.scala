package graft.score

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static-forwarder host for generated code ( `graft.score.JaroWinklerImpl
  * .sim(a, b)` is emitted verbatim into whole-stage-codegen Java).
  *
  * Allocation discipline: this is the innermost loop of the scoring stage
  * (30M+ calls per bench run, 10^? at corpus scale). The ASCII fast path
  * runs directly over UTF8String bytes with a thread-local scratch buffer
  * — ZERO allocations per call — because per-pair String + match-array
  * churn is what turns GC into the serial fraction that caps N-vs-4N
  * scaling efficiency at high thread counts. Non-ASCII inputs (rare after
  * `Normalize.canonicalTitle`) fall back to the reference String
  * implementation; for ASCII the two are exact-equal (one byte == one
  * UTF-16 char), which the 205-pair Winkler golden spec pins. */
object JaroWinklerImpl {

  // m1/m2 match flags share one buffer: [0, len1) and [len1, len1+len2).
  // Safe per-thread: each Spark task runs its codegen loop on one thread.
  private val scratch = new ThreadLocal[Array[Boolean]] {
    override def initialValue(): Array[Boolean] = new Array[Boolean](512)
  }

  def sim(a: UTF8String, b: UTF8String): Double = {
    val n1 = a.numBytes
    val n2 = b.numBytes
    if (a.numChars == n1 && b.numChars == n2) simAscii(a, n1, b, n2)
    else Similarity.jaroWinkler(a.toString, b.toString)
  }

  /** Jaro-Winkler over ASCII bytes; identical algorithm and constants as
    * Similarity.jaro/jaroWinkler (p=0.1, max prefix 4, boost floor 0.7). */
  private def simAscii(a: UTF8String, len1: Int, b: UTF8String, len2: Int): Double = {
    if (len1 == 0 && len2 == 0) return 1.0
    if (len1 == 0 || len2 == 0) return 0.0
    var buf = scratch.get()
    if (buf.length < len1 + len2) {
      buf = new Array[Boolean](Integer.highestOneBit(len1 + len2) * 2)
      scratch.set(buf)
    } else java.util.Arrays.fill(buf, 0, len1 + len2, false)
    val matchDist = math.max(0, math.max(len1, len2) / 2 - 1)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(len2 - 1, i + matchDist)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!buf(len1 + j) && a.getByte(i) == b.getByte(j)) {
          buf(i) = true; buf(len1 + j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (buf(i)) {
        while (!buf(len1 + k)) k += 1
        if (a.getByte(i) != b.getByte(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val t = transpositions / 2.0
    val j0 = (matches.toDouble / len1 + matches.toDouble / len2 +
      (matches - t) / matches) / 3.0
    if (j0 <= 0.7) return j0
    var prefix = 0
    val max = math.min(4, math.min(len1, len2))
    while (prefix < max && a.getByte(prefix) == b.getByte(prefix)) prefix += 1
    j0 + prefix * 0.1 * (1.0 - j0)
  }
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
