package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of the library's custom Catalyst expressions.
  *
  * Two entry points:
  *  - `GraftExtensions` for cluster deploys:
  *    `spark-submit --conf spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection path)
  *  - `GraftFunctions.register(spark)` for a live session (tests, REPL)
  *
  * After either, plain SQL can call them:
  *   `SELECT html_parts(html).text FROM pages`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("html_parts",
      new ExpressionInfo(classOf[HtmlParts].getCanonicalName, "html_parts"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "html_parts expects one argument")
        HtmlParts(children.head)
      }))

  /** Register on a live session (createOrReplaceTempFunction path). */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
