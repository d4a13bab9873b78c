package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Thin JDBC source/sink wrappers — the one reference surface the engine
  * consciously replaced with parquet (SURVEY §2.1): the reference reads
  * silver from Postgres (`silver_to_gold.py:667-692`, properties at
  * `silver_to_gold.py:654-659`) and appends gold to ClickHouse
  * (`silver_to_gold.py:249-265`). A user migrating that workload can point
  * these at the same databases; everything downstream is identical.
  *
  * Scale notes: [[readPartitioned]] is the form that matters beyond toy
  * sizes — `partitionColumn`/bounds/`numPartitions` give N parallel range
  * scans instead of one executor draining a single cursor, and Catalyst
  * still pushes filters/projections into the generated SQL per partition.
  * The unpartitioned [[read]] is a single-task scan, acceptable only for
  * dimension-sized tables.
  */
object Jdbc {

  /** Single-cursor read — dimension-sized tables only. */
  def read(spark: SparkSession, url: String, table: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .load()

  /** Range-partitioned parallel read — the at-scale path: each of
    * `numPartitions` tasks scans one `partitionColumn` range.
    */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .options(options)
      .load()

  /** Append/overwrite a DataFrame as a JDBC table (the reference's gold
    * append, `silver_to_gold.py:249-265`). Each partition writes its own
    * batch — parallelism is the upstream partitioning.
    */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .options(options)
      .mode(mode)
      .save()
}
