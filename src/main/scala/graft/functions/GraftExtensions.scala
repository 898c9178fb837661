package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark extension entry point: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions` registers the
  * engine's native expressions in every session built from that config —
  * no imperative `register` call, works for pure-SQL users and
  * thrift/connect servers where nobody owns session setup code.
  * (`VectorFunctions.register` remains for programmatic use; both routes
  * resolve to the same codegen'd expression.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PqEncode(exprs(0), exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("sq_encode"),
      new ExpressionInfo(classOf[SqEncode].getName, "sq_encode"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SqEncode(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((
      new FunctionIdentifier("sq_score"),
      new ExpressionInfo(classOf[SqScore].getName, "sq_score"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SqScore(exprs(0), exprs(1), exprs(2), exprs(3))))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpsExpr].getName, "winnow_fps"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowFpsExpr(exprs(0),
          exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int])))
  }
}
