package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column ↔ Catalyst-Expression converters.
  *
  * Spark 4 unified [[Column]] around `ColumnNode`, hiding the classic
  * expression accessors behind `private[sql]`. Extension libraries that
  * define native Catalyst expressions (we do: `graft.functions.Crc32Q`)
  * need exactly these two conversions, so this one-file shim lives in the
  * `org.apache.spark.sql` package to regain access. No Spark internals are
  * modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
