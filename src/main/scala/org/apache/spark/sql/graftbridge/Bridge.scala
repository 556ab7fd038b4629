package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4 moved classic `Column`
  * onto ColumnNode and made the converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so a library
  * defining native Catalyst expressions needs one file inside the
  * `org.apache.spark.sql` package namespace to lift them into Columns —
  * the same pattern public Spark extension libraries (Sedona, Delta,
  * Frameless) use. This is the ONLY file outside the `graft` namespace;
  * everything it exposes is a thin passthrough. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
