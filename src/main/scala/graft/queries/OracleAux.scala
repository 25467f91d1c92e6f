package graft.queries

import org.apache.spark.sql.DataFrame

/**
 * Side-channel tables for oracle-gating the approximate operators: the
 * partitioner routing (and dedup signatures) are seeded and deterministic,
 * so each query materializes them as parquet next to the verify output and
 * the DuckDB oracle *replays* the candidate join / band join / top-k merge
 * in plain SQL over them. This turns the P2-P7 routing surface and the
 * banded dedups — otherwise invisible to a SQL oracle — into hard
 * hash-compared gates (the reference's equivalent coverage:
 * LSHashSpaceFillingPartitionerTest.java:17-167,
 * StreamSearchJobTest.java:36-130).
 *
 * The aux directory is keyed by the sf dir so concurrent runs at different
 * scales never clash; [[graft.Verify]] substitutes [[Placeholder]] with
 * the concrete path when it dumps oracle_sql.json.
 */
object OracleAux {

  val Placeholder = "__GRAFT_AUX__"

  def dir(sfDir: String): String = {
    val norm = new java.io.File(sfDir).getAbsolutePath
    val tag = norm.replaceAll("[^A-Za-z0-9.]+", "_").replaceAll("^_+|_+$", "")
    s"/root/repo/target/oracle_aux/$tag"
  }

  /** Materialize an aux table for this sf dir (small by construction —
   * routing ids / signatures, never vectors). */
  def write(df: DataFrame, sfDir: String, table: String): Unit =
    df.coalesce(1).write.mode("overwrite").parquet(s"${dir(sfDir)}/$table")

  /** DuckDB reference to an aux table inside oracle SQL. */
  def ref(table: String): String =
    s"read_parquet('$Placeholder/$table/*.parquet')"

  /** Read an aux table back — downstream operators consume exactly the
   * bytes the oracle replays (and no lingering persist() is needed). */
  def read(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      table: String): DataFrame =
    spark.read.parquet(s"${dir(sfDir)}/$table")

  def substitute(sql: String, sfDir: String): String =
    sql.replace(Placeholder, dir(sfDir))
}
