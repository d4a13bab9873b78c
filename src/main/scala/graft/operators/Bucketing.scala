package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins (SCALE.md): pre-shuffle both sides of a
  * repeated join ONCE at write time so every subsequent join is
  * shuffle-free.
  *
  * `bucketBy(n, key)` + `sortBy(key)` at write hashes rows into n files
  * per partition by the join key; two tables bucketed on the same key
  * with the same n join with zero `Exchange` — the storage layout IS the
  * shuffle, amortized over every future query. This is the parquet
  * analog of the reference's MergeTree `ORDER BY (date, order_no, …)`
  * sort keys (`silver_to_gold.py:144-146`), extended to co-location.
  *
  * At 100 TB: bucket the fact and its largest dimension on the join key
  * (e.g. lineitem and orders on the order key, 4096 buckets); the nightly
  * write pays one shuffle, and every mart build afterwards joins
  * shuffle-free.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet under the
    * session warehouse dir).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a dropped-from-catalog table can leave its managed location behind
    // (e.g. metadata lost across sessions); clear it or CREATE refuses
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = new java.io.File(warehouse, table.toLowerCase)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables — plans with no shuffle on either side
    * (asserted in BucketingSpec).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
