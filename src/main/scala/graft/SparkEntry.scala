package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-area objects; every entry with an
  * oracle is hash-checked against DuckDB at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesRelational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueriesRelational.queries ++ QueriesDialect.queries ++
      QueriesPipeline.queries ++ QueriesGraph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    QueriesRelational.oracleSql ++ QueriesDialect.oracleSql ++
      QueriesPipeline.oracleSql ++ QueriesGraph.oracleSql
}
