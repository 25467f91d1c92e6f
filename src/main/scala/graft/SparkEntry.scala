package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{AnnQueries, EvalQueries, PartitionQueries, PqQueries, Relational, TextQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
 *
 * `queries` is the full operator surface (one entry per implemented
 * operator from SURVEY.md §2 plus the training-data-pipeline extensions);
 * `oracleSql` holds the DuckDB twin for every SQL-expressible entry.
 */
object SparkEntry {

  /** Session settings every entry point needs (the events table stores
   * TIMESTAMP(NANOS) which Spark only reads as raw int64). */
  def configure(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the top-k merge aggregates over thousands of query-id groups; the
      // default fallback (128 keys) silently degrades ObjectHashAggregate
      // to sort-based agg — a full sort + spill of every (query, vector)
      // pair. Keep the hash path for realistic query counts.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.knn(Metric.L2)(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ VectorQueries.queries ++ TextQueries.queries ++
      PartitionQueries.queries ++ AnnQueries.queries ++ EvalQueries.queries ++
      PqQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables (plus the deterministic routing/signature aux
    * parquet the ANN/dedup entries materialize — see
    * [[graft.queries.OracleAux]]). Aux paths are resolved for the given
    * sf dir. */
  def oracleSqlFor(sfDir: String): Map[String, String] =
    (Relational.oracles ++ VectorQueries.oracles ++ TextQueries.oracles ++
      PartitionQueries.oracles ++ AnnQueries.oracles ++ EvalQueries.oracles ++
      PqQueries.oracles)
      .map { case (k, v) => k -> graft.queries.OracleAux.substitute(v, sfDir) }

  /** Default-sf view of [[oracleSqlFor]]: follows SPARK_GRAFT_SF_DIR when
   * set, else the driver's gate scale (sf0.01) — so a no-arg consumer
   * running at another sf resolves the matching aux directory. */
  def oracleSql: Map[String, String] =
    oracleSqlFor(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
}
