package org.apache.spark.sql.graftext

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the engine's native functions, both as a
  * `SparkSessionExtensions` (for `.withExtensions` / the
  * spark.sql.extensions conf on a cluster) and as a runtime helper for an
  * existing session. Makes `vec_dot(a, b)` and `topk_by(score, id, k)`
  * first-class in spark.sql text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDot)
    e.injectFunction(GraftExtensions.vecSub)
    e.injectFunction(GraftExtensions.topkBy)
    e.injectFunction(GraftExtensions.pairCombos)
    e.injectOptimizerRule(_ => RewriteRankOneWindow)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private[graftext] val vecDot = (
    FunctionIdentifier("vec_dot"),
    info("vec_dot", "vec_dot(a, b) - dot product of two float arrays"),
    (exprs: Seq[Expression]) => FloatVectorDot(exprs(0), exprs(1)))

  private[graftext] val vecSub = (
    FunctionIdentifier("vec_sub"),
    info("vec_sub", "vec_sub(a, b) - elementwise difference of two float arrays (the PQ residual step)"),
    (exprs: Seq[Expression]) => FloatVectorSub(exprs(0), exprs(1)))

  private[graftext] val topkBy = (
    FunctionIdentifier("topk_by"),
    info("topk_by", "topk_by(score, id, k) - top-k (score,id) pairs, best first"),
    (exprs: Seq[Expression]) => {
      val k = exprs(2) match {
        case Literal(v: Int, _) => v
        case other => other.eval() match {
          case n: java.lang.Number => n.intValue()
          case v => throw new IllegalArgumentException(
            s"topk_by: k must be a numeric literal, got $v")
        }
      }
      TopKByScore(exprs(0), exprs(1), k)
    })

  private[graftext] val pairCombos = (
    FunctionIdentifier("pair_combos"),
    info("pair_combos",
      "pair_combos(arr) - all (a, b) element pairs with index i < j"),
    (exprs: Seq[Expression]) => PairCombos(exprs(0)))

  /** Register on an already-running session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("vec_dot", vecDot._3, "scala_udf")
    registry.createOrReplaceTempFunction("vec_sub", vecSub._3, "scala_udf")
    registry.createOrReplaceTempFunction("topk_by", topkBy._3, "scala_udf")
    registry.createOrReplaceTempFunction("pair_combos", pairCombos._3, "scala_udf")
  }
}
