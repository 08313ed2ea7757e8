package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.expressions.{CosineSimilarity, MinHashSignature, SimHashSignature}
import graft.plans.{GraftStrategy, TopKRewriteRule}

/** Session extensions: registers the engine's native functions for SQL
  * use, plus the whole-operator extension path — the top-k-per-group
  * optimizer rewrite ([[graft.plans.TopKRewriteRule]]) and its physical
  * strategy ([[graft.plans.GraftStrategy]]). Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => TopKRewriteRule)
    e.injectPlannerStrategy(_ => GraftStrategy)
    def arity(name: String, n: Int)(
        exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = {
      require(exprs.length == n,
        s"$name expects $n argument(s), got ${exprs.length}")
      exprs
    }
    e.injectFunction((
      new FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val a = arity("cosine_similarity", 2)(exprs); CosineSimilarity(a(0), a(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(arity("minhash_signature", 1)(exprs).head)))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHashSignature].getName, "simhash64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHashSignature(arity("simhash64", 1)(exprs).head)))
  }
}
