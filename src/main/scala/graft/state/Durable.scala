package graft.state

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable iteration state for iterative operators (hostRank, duplicate
  * clusters, the crawl capture accumulator).
  *
  * `localCheckpoint(true)` pins an iteration's rows in executor storage:
  * correct and fast single-machine, but NOT fault-tolerant — lineage is
  * truncated, so on a real cluster one lost executor kills the whole job
  * with no replay path. When a caller provides a state dir, iterations
  * instead round-commit through TableIO (atomic manifest rename, snapshot
  * id = iteration number) and continue from a parquet scan of the commit:
  * executor loss replays from files, driver loss resumes from the last
  * committed iteration — the same T3/T4 crash-exact discipline the crawl
  * frontier already has, extended to iteration state.
  */
object Durable {

  /** Pin one iteration's result. Durable (table defined): TableIO commit
    * at snapshot id `iter`, then read back (downstream lineage = file
    * scan). In-memory: eager localCheckpoint. */
  def pin(df: DataFrame, table: Option[String], iter: Long): DataFrame = table match {
    case Some(t) =>
      TableIO.commitAs(df, t, iter)
      TableIO.read(df.sparkSession, t, Some(iter)).get
    case None => df.localCheckpoint(eager = true)
  }

  /** Resume point: the largest committed iteration ≤ `maxIter`, with its
    * data. None when no state dir or nothing committed yet. The caller
    * owns keying the dir to its input — resuming a dir written for a
    * different input is undefined. */
  def resume(spark: SparkSession, table: Option[String],
             maxIter: Long): Option[(Long, DataFrame)] =
    table.flatMap { t =>
      TableIO.listSnapshots(t).filter(_ <= maxIter).lastOption.map { id =>
        id -> TableIO.read(spark, t, Some(id)).get
      }
    }
}
