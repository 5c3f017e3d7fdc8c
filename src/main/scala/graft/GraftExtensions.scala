package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProductD, HllEstimate, HllSketchAgg, QrhpSignatureExpr, RhpSignatureExpr}

/** Session extension registering graft's native Catalyst functions for
  * SQL use — `spark.sql.extensions=graft.GraftExtensions` on a cluster,
  * or `GraftExtensions.register(spark)` programmatically. This makes
  * the engine a drop-in library: the custom kernels are reachable from
  * pure SQL, not just the Scala DSL.
  *
  *   SELECT dot_d(a.embedding, b.embedding)        -- double dot product
  *   SELECT rhp_signature(embedding, 16)           -- 16-bit LSH bucket
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) for every graft SQL function. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("dot_d",
      new ExpressionInfo(classOf[DotProductD].getName, "dot_d"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "dot_d(arrayFloat, arrayFloat)")
        DotProductD(exprs(0), exprs(1))
      }),
    ("rhp_signature",
      new ExpressionInfo(classOf[RhpSignatureExpr].getName, "rhp_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          "rhp_signature(arrayFloat, nBitsLiteral[, offsetLiteral])")
        val off = if (exprs.length == 3) intLit(exprs(2), "rhp_signature offset") else 0
        RhpSignatureExpr(exprs(0), intLit(exprs(1), "rhp_signature nBits"), off)
      }),
    ("qrhp_signature",
      new ExpressionInfo(classOf[QrhpSignatureExpr].getName, "qrhp_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "qrhp_signature(arrayFloat, nBitsLiteral)")
        QrhpSignatureExpr(exprs(0), intLit(exprs(1), "qrhp_signature nBits"))
      }),
    ("hll_sketch",
      new ExpressionInfo(classOf[HllSketchAgg].getName, "hll_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.nonEmpty && exprs.length <= 2, "hll_sketch(longCol[, pLiteral])")
        val p = if (exprs.length == 2) intLit(exprs(1), "hll_sketch p") else 12
        HllSketchAgg(exprs(0), p).toAggregateExpression()
      }),
    ("hll_estimate",
      new ExpressionInfo(classOf[HllEstimate].getName, "hll_estimate"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "hll_estimate(sketch)")
        HllEstimate(exprs(0))
      }))

  /** Programmatic registration into an existing session (tests, REPLs —
    * anywhere the session predates the library on the classpath).
    */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
