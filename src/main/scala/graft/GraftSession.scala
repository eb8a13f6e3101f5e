package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration: AQE on (for
  * runtime skew handling on the seen-join), shuffle partitions sized to
  * cores (not the 200 default), UTC timezone for oracle parity.
  */
object GraftSession {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val spark = builder(s"local[$cores]", cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.registerAll(spark)
    spark
  }
}
