package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ⇄ Column bridge for graft's native expressions.
  *
  * Spark 4's `Column` wraps a ColumnNode (the Connect-era API), and the
  * classic converters (`org.apache.spark.sql.classic.ExpressionUtils`)
  * are `private[sql]` — so expressions that carry runtime objects (e.g. a
  * built Bloom filter, which cannot ride a SQL function-registry call)
  * need this one-file bridge in the sql package. Standard extension
  * technique; nothing here depends on non-public behavior beyond the
  * accessor visibility.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
