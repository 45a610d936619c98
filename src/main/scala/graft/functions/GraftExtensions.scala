package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions so both the Column API and `spark.sql("... graft_dot(a,b)
  * ...")` resolve them. Installed by GraftSession via
  * `spark.sql.extensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_dot expects exactly 2 arguments, got ${children.length}")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedLongIntersect].getName, "graft_sorted_intersect"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          s"graft_sorted_intersect expects exactly 2 arguments, got ${children.length}")
        SortedLongIntersect(children.head, children(1))
      }))
  }
}
