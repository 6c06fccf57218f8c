package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-pack operator queries; every
  * SQL-expressible one has a DuckDB oracle in `oracleSql` with
  * identical output column names and a total ORDER BY on both sides.
  */
object SparkEntry {

  /** Flagship: the E3 power-analysis pipeline end-to-end on sf0.001 —
    * per-stage baseline thresholds (driver smoke-checks rows > 0).
    */
  def entry(spark: SparkSession): DataFrame =
    graft.hvac.HvacPipeline.thresholdsDf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.Relational.queries ++
      _root_.graft.queries.EventsQueries.queries ++
      _root_.graft.queries.TextQueries.queries ++
      _root_.graft.queries.SimilarityQueries.queries ++
      _root_.graft.queries.PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.Relational.oracle ++
      _root_.graft.queries.EventsQueries.oracle ++
      _root_.graft.queries.TextQueries.oracle ++
      _root_.graft.queries.SimilarityQueries.oracle ++
      _root_.graft.queries.PipelineQueries.oracle
}
