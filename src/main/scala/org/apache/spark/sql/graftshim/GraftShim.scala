package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters (the
  * standard technique for Spark-extension libraries: one small object
  * inside the org.apache.spark.sql package tree). */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Resolve a managed table's storage location from the session catalog:
    * the table's own metadata when it exists, else the catalog's default
    * path for the identifier (warehouse layout + db + name escaping —
    * never string-concatenated by callers). */
  def tableLocation(spark: org.apache.spark.sql.SparkSession,
                    table: String): java.net.URI = {
    val catalog = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
    val ident = org.apache.spark.sql.catalyst.TableIdentifier(table)
    if (catalog.tableExists(ident)) catalog.getTableMetadata(ident).location
    else catalog.defaultTablePath(ident)
  }
}
