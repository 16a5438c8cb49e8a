package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module catalogs; every key has a
  * matching DuckDB oracle in `oracleSql` unless the operator is not
  * SQL-expressible (driver then does a rows-only check).
  */
object SparkEntry {

  private def catalogs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (q.Relational.queries, q.Relational.oracle),
      (q.TextOps.queries, q.TextOps.oracle),
      (q.VectorOps.queries, q.VectorOps.oracle),
      (q.MarcOps.queries, q.MarcOps.oracle),
      (q.PipelineOps.queries, q.PipelineOps.oracle),
      (q.StoreOps.queries, q.StoreOps.oracle),
      (q.AnalyticsOps.queries, q.AnalyticsOps.oracle),
      (q.EngineOps.queries, q.EngineOps.oracle),
      (q.RealCorpus.queries, q.RealCorpus.oracle),
      (q.RealVec.queries, q.RealVec.oracle),
      (q.RealMarc.queries, q.RealMarc.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q.Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.map(_._2).reduce(_ ++ _)
}
