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
        FunctionIdentifier("long_dot"),
        new ExpressionInfo(classOf[VectorFunctions.LongDot].getName, "long_dot"),
        (children: Seq[Expression]) => VectorFunctions.LongDot(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("long_sq_dist"),
        new ExpressionInfo(classOf[VectorFunctions.LongSqDist].getName, "long_sq_dist"),
        (children: Seq[Expression]) => VectorFunctions.LongSqDist(children(0), children(1))
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("top_k_by"),
        new ExpressionInfo(classOf[TopKBy].getName, "top_k_by"),
        TopKBy.sqlBuilder
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("chunk_text"),
        new ExpressionInfo(classOf[ChunkText].getName, "chunk_text"),
        ChunkText.builder(ChunkingConfig())
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("zorder2"),
        new ExpressionInfo(graft.operators.Layout.getClass.getName, "zorder2"),
        (children: Seq[Expression]) => graft.operators.Layout.zorder2Expr(children(0), children(1))
      )
    )
  }
}
