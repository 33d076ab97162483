package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (registered via `spark.sql.extensions` by every
  * harness session): injects the engine's native Catalyst expressions
  * into the function registry so both the DataFrame API (`expr(...)`)
  * and `spark.sql` can call them. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension (SURVEY §7.3 (c)): the native as-of join
    ext.injectPlannerStrategy(_ => new AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_hamming(a, b) takes two arguments")
        HammingDistance(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_inter_count"),
      new ExpressionInfo(classOf[SortedInterCount].getName, "graft_inter_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_inter_count(a, b) takes two arguments")
        SortedInterCount(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_overlap_reaches"),
      new ExpressionInfo(classOf[OverlapReaches].getName, "graft_overlap_reaches"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_overlap_reaches(a, b, alpha) takes three arguments")
        OverlapReaches(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(a, b) takes two arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_collect_capped"),
      new ExpressionInfo(classOf[CappedCollect].getName, "graft_collect_capped"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_collect_capped(x, cap) takes two arguments")
        CappedCollect(children.head, children(1))
      }))
  }
}
