package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-gated query: a Spark DataFrame program over the testdata
  * tables plus (when SQL-expressible) the equivalent ANSI SQL the driver
  * runs in DuckDB over the identical parquet files.
  *
  * Column names are part of the contract: the driver's compare sorts
  * columns by name before hashing, so every computed column is aliased
  * identically on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))

  /** Not SQL-expressible (streaming, hash-function-specific, …) —
    * the driver records a weaker rows-only check.
    */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
