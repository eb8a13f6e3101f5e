package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data mixing: deterministic, seeded, per-stratum sampling.
  * A pretraining corpus is rarely used whole — sources/languages are
  * up- or down-weighted. The sampler here is a pure function of
  * (id, salt): reproducible across runs, engines (the DuckDB oracle
  * replays it bitwise), partitionings and row orders — unlike
  * `DataFrame.sample`, whose outcome depends on partition layout.
  */
object Mixing {

  /** Uniform 32-bit hash of (id, salt) as a long in [0, 2^32): the first
    * 8 hex chars of sha256. Changing `salt` draws an independent sample. */
  def hashBucket(id: Column, salt: String): Column =
    conv(substring(sha2(concat(id.cast("string"), lit(":" + salt)), 256), 1, 8), 16, 10)
      .cast("long")

  /** Keep each row of stratum s with probability rates(s): a row survives
    * iff hash(id, salt) < rate × 2^32. Strata absent from `rates` get
    * `defaultRate`. The rate dim is broadcast (one row per stratum); the
    * corpus side is a narrow filter — zero shuffle. */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      rates: Map[String, Double],
      idCol: String = "doc_id",
      salt: String = "mix",
      defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // thresholds computed once, driver-side, as exact longs
    val dim = rates.toSeq
      .map { case (s, r) => (s, (r.max(0.0).min(1.0) * 4294967296.0).toLong) }
      .toDF(stratumCol, "__threshold")
    val defaultThreshold = (defaultRate.max(0.0).min(1.0) * 4294967296.0).toLong
    df.join(broadcast(dim), Seq(stratumCol), "left")
      .withColumn("__threshold", coalesce(col("__threshold"), lit(defaultThreshold)))
      .filter(hashBucket(col(idCol), salt) < col("__threshold"))
      .drop("__threshold")
  }
}
