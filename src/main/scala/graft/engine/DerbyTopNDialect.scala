package graft.engine

import java.sql.SQLException

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, MetadataBuilder}

/** Corrected Derby dialect for limit/top-N pushdown. Spark 4.1's stock
  * `DerbyDialect` advertises limit support but renders an EMPTY limit
  * clause, so an opted-in pushed top-N sorts database-side and never
  * limits — and Spark, trusting the full pushdown, returns every row
  * (the wrong-results trap JdbcV2Spec pins; the reason
  * [[JdbcV2.register]] defaults `pushDownLimits` off). Derby has had
  * the SQL:2008 fetch-first clause since 10.7, so the fix is one
  * override: render `FETCH FIRST n ROWS ONLY`.
  *
  * The stock class is `private[jdbc]`, so everything else — type
  * mappings, supported pushdown functions, error classification — is
  * DELEGATED to the stock instance (fetched through the public
  * `JdbcDialects.get` before this dialect swaps in; see [[install]]
  * for why the stock dialect must be replaced, not shadowed).
  *
  * Scoped, not ambient: [[install]] registers it and returns an
  * uninstall handle, so a deployment opts in per-process and the
  * pinned-bug guard can still measure the stock behavior.
  */
class DerbyTopNDialect private[engine] (stock: JdbcDialect) extends JdbcDialect {
  override def canHandle(url: String): Boolean = stock.canHandle(url)

  // the fix: a real fetch-first clause, and the support flag to match.
  // (Upstream's inconsistency is exactly here: pushTopN checks only the
  // pushDownLimit OPTION, so stock Derby pushes top-N while rendering
  // an empty clause; pushLimit checks supportsLimit, which stock Derby
  // leaves false — so bare limits never pushed at all.)
  override def supportsLimit: Boolean = true
  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""

  // the stock dialect's behavior, verbatim
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    stock.getCatalystType(sqlType, typeName, size, md)
  override def getJDBCType(dt: DataType): Option[JdbcType] =
    stock.getJDBCType(dt)
  override def isSupportedFunction(funcName: String): Boolean =
    stock.isSupportedFunction(funcName)
  override def isCascadingTruncateTable(): Option[Boolean] =
    stock.isCascadingTruncateTable()
  override def isObjectNotFoundException(e: SQLException): Boolean =
    stock.isObjectNotFoundException(e)
  override def isSyntaxErrorBestEffort(e: SQLException): Boolean =
    stock.isSyntaxErrorBestEffort(e)
  override def renameTable(oldTable: Identifier, newTable: Identifier): String =
    stock.renameTable(oldTable, newTable)
  override def getTableCommentQuery(table: String, comment: String): String =
    stock.getTableCommentQuery(table, comment)
  override def getUpdateColumnNullabilityQuery(tableName: String,
      columnName: String, isNullable: Boolean): String =
    stock.getUpdateColumnNullabilityQuery(tableName, columnName, isNullable)
  override def classifyException(e: Throwable, condition: String,
      messageParameters: Map[String, String], description: String,
      isRuntime: Boolean): Throwable with org.apache.spark.SparkThrowable =
    stock.classifyException(e, condition, messageParameters, description,
      isRuntime)
}

object DerbyTopNDialect {

  /** The install handle: the fixed dialect plus the stock one it
    * replaced, so [[uninstall]] can restore the exact prior state.
    */
  final case class Installed(fixed: JdbcDialect, stock: JdbcDialect)

  /** Register the corrected dialect, REPLACING the stock Derby dialect
    * rather than shadowing it: with two dialects matching one URL,
    * `JdbcDialects.get` wraps them in an `AggregatedDialect` whose
    * un-overridden limit clause is the generic `LIMIT n` — a THIRD
    * wrong behavior (Derby rejects the keyword). Swap-out keeps the
    * match unique, so the fixed clause is the one rendered.
    */
  def install(): Installed = {
    val stock = JdbcDialects.get("jdbc:derby:")
    val fixed = new DerbyTopNDialect(stock)
    JdbcDialects.unregisterDialect(stock)
    JdbcDialects.registerDialect(fixed)
    Installed(fixed, stock)
  }

  /** Restore stock Derby behavior. */
  def uninstall(h: Installed): Unit = {
    JdbcDialects.unregisterDialect(h.fixed)
    JdbcDialects.registerDialect(h.stock)
  }
}
