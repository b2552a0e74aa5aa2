package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import graft.functions.FunctionRegistry

/** User-facing facade mirroring the reference's database API surface
  * (SURVEY.md §2.10-2.11): `query(sql)` ↔ `OSQLSynchQuery`,
  * `browseClass` ↔ `ODatabaseDocumentTx.browseClass`,
  * `registerFunction` ↔ `OSQLEngine.registerFunction`.
  * Instead of a network server, the product API returns DataFrames —
  * the Spark-native equivalent of the remote COMMAND op.
  */
final class GraftSession(val spark: SparkSession, val catalog: Catalog) {
  val functions = new FunctionRegistry
  private[engine] val translator = new Translator(catalog, functions)

  /** Run a dialect SELECT → DataFrame (lazy; caller triggers actions). */
  def query(sql: String): DataFrame =
    translator.select(Parser.parseSelect(sql))

  /** Parse any supported statement; SELECTs return rows, DML/DDL are
    * interpreted by [[Commands]]. */
  def command(sql: String): DataFrame = Parser.parseStatement(sql) match {
    case s: Ast.SelectStmt => translator.select(s)
    case other => Commands.execute(this, other)
  }

  /** `browseClass(name, polymorphic)` — record iteration API. */
  def browseClass(name: String, polymorphic: Boolean = true): DataFrame =
    if (polymorphic) catalog.polymorphicScan(name) else catalog.table(name)

  /** runtime-pluggable SQL function (`OSQLEngine.registerFunction`). */
  def registerFunction(name: String, f: Seq[Column] => Column): Unit =
    functions.register(name, f)
}

object GraftSession {
  /** session over the driver-provided testdata tables. */
  def forTestdata(spark: SparkSession, dir: String): GraftSession =
    new GraftSession(spark, Catalog.forTestdata(spark, dir))
}
