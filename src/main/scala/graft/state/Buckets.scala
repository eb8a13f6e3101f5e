package graft.state

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the third co-location tool next to broadcast
  * (small dims) and repartition (one-shot co-partitioning). Bucketing
  * persists the partitioning INTO the table layout, so every later
  * equi-join or aggregation on the bucket key skips its exchange — the
  * right trade for state joined every round at 100 TB (seen-set
  * maintenance, CDX dedupe indexes, digest lookup tables): pay the shuffle
  * once at write, never at read.
  *
  * Uses the session catalog's native parquet bucketing (no Hive needed);
  * `path` makes the table external so the files live next to the engine's
  * other state, and dropping the table never deletes data.
  */
object Buckets {

  /** Write `df` as an external bucketed+sorted parquet table. Both sides
    * of a future join must use the same `nBuckets` and key for the
    * exchange-free plan. */
  def save(df: DataFrame, name: String, path: String, key: String,
           nBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write
      .mode(mode)
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(name)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  def drop(spark: SparkSession, name: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
}
