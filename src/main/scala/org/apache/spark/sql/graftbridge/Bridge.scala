package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides these conversions behind
  * private[sql]; extension libraries conventionally expose them from a
  * file compiled into the org.apache.spark.sql package tree (same
  * technique the ecosystem uses for custom Expressions). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Rewrite an aggregate Column to its DISTINCT form (`avg(DISTINCT x)`,
    * `stddev_samp(DISTINCT x)`, …). Spark's DataFrame API only surfaces
    * distinct variants for count/sum; the engine needs it for every
    * aggregate (the dialect's per-aggregate btree dedup). Spark 4
    * Columns wrap ColumnNodes — flip isDistinct on the function node
    * (the sql-api shape every functions.* aggregate produces). */
  def distinctAgg(c: Column): Column = c.node match {
    case f: org.apache.spark.sql.internal.UnresolvedFunction =>
      Column(f.copy(isDistinct = true))
    case _ => throw new IllegalArgumentException(
      s"distinctAgg: not a function column: ${c.node}")
  }
}
