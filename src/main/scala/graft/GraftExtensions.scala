package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VectorFunctions
import graft.plans.{ChunkText, TopKBy}

/** SparkSessionExtensions installer: makes graft's custom Catalyst
  * functions available in every session of a cluster via
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`),
  * instead of per-session registry calls — the deployment story for the
  * SQL surface.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[VectorFunctions.CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => VectorFunctions.CosineSimilarity(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("top_k_by"),
        new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
        (children: Seq[Expression]) => {
          require(children.length == 3, s"top_k_by(score, id, k) takes 3 args, got ${children.length}")
          if (!children(2).foldable)
            throw new IllegalArgumentException("top_k_by: k must be an integer literal")
          val k = children(2).eval(null) match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(s"top_k_by: k must be an integer literal, got $other")
          }
          import org.apache.spark.sql.catalyst.expressions.Cast
          import org.apache.spark.sql.types.{DoubleType, LongType}
          TopKBy(Cast(children(0), DoubleType), Cast(children(1), LongType), k)
            .toAggregateExpression()
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("chunk_text"),
        new ExpressionInfo(classOf[ChunkText].getName, "chunk_text"),
        ChunkText.builder(ChunkingConfig())
      )
    )
  }
}
