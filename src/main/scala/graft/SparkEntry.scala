package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator from SURVEY.md §2
  * (and the LLM-data-pipeline extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for the driver's hash-compare at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * TPC-H Q1-shaped grouped aggregation over lineitem. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("a3_groupby_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Temporal.queries ++
      operators.TextOps.queries ++
      operators.Dedup.queries ++
      operators.Pipeline.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.ArrayOps.queries ++
      operators.StreamOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.Temporal.oracles ++
      operators.TextOps.oracles ++
      operators.Dedup.oracles ++
      operators.Pipeline.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.ArrayOps.oracles ++
      operators.StreamOps.oracles
}
