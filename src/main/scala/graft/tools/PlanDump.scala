package graft.tools

/** Print a query's optimized + executed plan: `runMain graft.tools.PlanDump <sfDir> <query>`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val df = graft.SparkEntry.queries(args(1))(spark, args(0))
    println("==== OPTIMIZED ====")
    println(df.queryExecution.optimizedPlan.treeString.take(8000))
  }
}
