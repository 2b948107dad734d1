package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 scopes `ExpressionUtils` (the only
  * supported way to wrap a raw Catalyst `Expression` into a classic
  * `Column`) as `private[sql]`, so extension libraries conventionally
  * expose it via a shim inside the `org.apache.spark.sql` package tree —
  * this file is that shim and nothing else lives here.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
