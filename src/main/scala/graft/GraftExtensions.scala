package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Crc32QExpression

/** SparkSessionExtensions entry point: registers the engine's native
  * functions for SQL use.
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  *   .getOrCreate()
  * spark.sql("SELECT crc32q(token) FROM batch")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("crc32q"),
      new ExpressionInfo(classOf[Crc32QExpression].getName, "crc32q"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          s"crc32q expects exactly 1 argument, got ${children.size}")
        Crc32QExpression(children.head)
      }))
  }
}
