package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Dumps `.explain("formatted")` for named declared queries to
  * <outDir>/<query>_<suffix>.txt — the judge-facing before/after plan
  * artifacts (plans/r06/). Usage:
  *   runMain graft.tools.PlanDump <outDir> <suffix> <q1,q2,...|all> [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names: Set[String] =
      if (args(2) == "all") graft.SparkEntry.queries.keySet else args(2).split(",").toSet
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    new java.io.File(outDir).mkdirs()
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.filter(q => names(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val txt = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"wrote $outDir/${name}_$suffix.txt")
        } catch {
          case e: Throwable => println(s"FAILED $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
