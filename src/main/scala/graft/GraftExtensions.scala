package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{CharShingleSetExpr, DotProductD, HllEstimate, HllSketchAgg,
  PolyHashExpr, QrhpSignatureExpr, RhpMultiSignatureExpr, RhpSignatureExpr, SimHashLanesExpr}

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
        require(exprs.length == 2 || exprs.length == 3,
          "qrhp_signature(arrayFloat, nBitsLiteral[, planeOffsetLiteral])")
        val off = if (exprs.length == 3) intLit(exprs(2), "qrhp_signature planeOffset") else 0
        QrhpSignatureExpr(exprs(0), intLit(exprs(1), "qrhp_signature nBits"), off)
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
      }),
    ("poly_hash",
      new ExpressionInfo(classOf[PolyHashExpr].getName, "poly_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "poly_hash(string)")
        PolyHashExpr(exprs(0))
      }),
    ("rhp_multi_signature",
      new ExpressionInfo(classOf[RhpMultiSignatureExpr].getName, "rhp_multi_signature"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3,
          "rhp_multi_signature(arrayFloat, nBitsLiteral, nTablesLiteral)")
        RhpMultiSignatureExpr(exprs(0),
          intLit(exprs(1), "rhp_multi_signature nBits"),
          intLit(exprs(2), "rhp_multi_signature nTables"))
      }),
    ("simhash_lanes",
      new ExpressionInfo(classOf[SimHashLanesExpr].getName, "simhash_lanes"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "simhash_lanes(longCol)")
        SimHashLanesExpr(exprs(0))
      }),
    ("char_shingle_set",
      new ExpressionInfo(classOf[CharShingleSetExpr].getName, "char_shingle_set"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "char_shingle_set(string, nLiteral)")
        CharShingleSetExpr(exprs(0), intLit(exprs(1), "char_shingle_set n"))
      }),
    ("top_k_lex",
      new ExpressionInfo(classOf[graft.functions.TopKLex].getName, "top_k_lex"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 4,
          "top_k_lex(ordDescLong, ordAscLong, keyString, kLiteral)")
        graft.functions.TopKLex(exprs(0), exprs(1), exprs(2),
          intLit(exprs(3), "top_k_lex k")).toAggregateExpression()
      }),
    ("quantile_sketch",
      new ExpressionInfo(classOf[graft.functions.QuantileSketchAgg].getName, "quantile_sketch"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 3, "quantile_sketch(hashLong, valueDouble, kLiteral)")
        graft.functions.QuantileSketchAgg(exprs(0), exprs(1),
          intLit(exprs(2), "quantile_sketch k")).toAggregateExpression()
      }),
    ("token_stats",
      new ExpressionInfo(classOf[graft.functions.GreedyTokenStatsExpr].getName, "token_stats"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2 || exprs.length == 3,
          "token_stats(string, vocabArrayLiteral[, maxNLiteral])")
        // the vocab must fold to a non-null constant: it ships inside
        // the expression (the broadcast-vocab contract of the Scala API)
        def reject(what: Any): Nothing = throw new IllegalArgumentException(
          s"token_stats vocab must be a foldable non-null array<string>, got $what")
        val vocab = exprs(1) match {
          case e if e.foldable => e.dataType match {
            case org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.StringType, _) =>
              e.eval() match {
                case null => reject("NULL")
                case arr: org.apache.spark.sql.catalyst.util.ArrayData =>
                  arr.toArray[org.apache.spark.unsafe.types.UTF8String](
                      org.apache.spark.sql.types.StringType)
                    .map(u => Option(u).map(_.toString).getOrElse(
                      reject("an array containing NULL")))
                    .toSeq
              }
            case other => reject(other)
          }
          case other => reject(other)
        }
        val maxN = if (exprs.length == 3) intLit(exprs(2), "token_stats maxN") else 4
        graft.functions.GreedyTokenStatsExpr(exprs(0), vocab, maxN)
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
