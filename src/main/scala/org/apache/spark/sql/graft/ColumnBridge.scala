package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters of the
  * classic API (`org.apache.spark.sql.classic.ExpressionUtils`) for
  * library operators that construct custom Catalyst expressions
  * PROGRAMMATICALLY with non-literal state — e.g. [[graft.functions
  * .BloomMightContain]] holding a `Broadcast[BloomFilter]`, which cannot
  * route through the FunctionRegistry path the vec functions use
  * (function builders only receive child expressions). The standard
  * extension-point technique: a shim compiled into the `sql` package
  * tree, no Spark internals modified or copied.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
