package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Every registered query across the operator families. */
  def registry: Seq[Q] =
    RelationalQueries.all ++ PipelineQueries.all ++ TextQueries.all ++
      SimilarityQueries.all ++ StreamingQueries.all ++ MultimodalQueries.all ++
      AnalyticsQueries.all ++ TemporalQueries.all ++ CurationQueries.all ++
      RetrievalQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.sources.Tables
    graft.operators.Relational.factAssembly(
      Tables.orders(spark, "/root/testdata/sf0.001"),
      Tables.lineitem(spark, "/root/testdata/sf0.001"),
      Tables.part(spark, "/root/testdata/sf0.001"),
      Tables.supplier(spark, "/root/testdata/sf0.001"),
      Tables.customer(spark, "/root/testdata/sf0.001"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
