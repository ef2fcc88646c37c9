package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.{AnalyticsCatalog, QueryCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The operator inventory lives in [[graft.ops.QueryCatalog]] (relational),
  * with graph / analytics / streaming catalogs merged in as they land.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's read-back verification (`MATCH (a:Article)
    * RETURN a.title AS title LIMIT 5`, /root/reference/main.py:16-22) in
    * spirit: ingest → aggregate → read back a small result. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.entries.find(_.name == "q03_join_revenue_by_nation").get
      .fn(spark, "/root/testdata/sf0.001")

  private def allEntries: Seq[QueryCatalog.Entry] =
    QueryCatalog.entries ++ AnalyticsCatalog.entries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(e => e.name -> e.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(e => e.oracle.map(e.name -> _)).toMap
}
