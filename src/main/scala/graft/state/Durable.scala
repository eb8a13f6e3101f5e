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
    * scan). In-memory: localCheckpoint — plan truncation is immediate
    * either way; `eager = false` defers the MATERIALIZATION to the first
    * consumer, so an iterative caller whose next step immediately acts on
    * the result (a convergence count, a codebook collect, the final
    * consumer) skips one blocking driver job per iteration. Callers whose
    * pinned frame is first touched by CONCURRENT consumers should keep
    * `eager = true` (a lazy checkpoint races its first materialization).
    * `counters` ride the manifest (iteration 0 conventionally records
    * `inputFingerprint`). */
  def pin(df: DataFrame, table: Option[String], iter: Long,
          counters: Map[String, Long] = Map.empty,
          eager: Boolean = true): DataFrame = table match {
    case Some(t) =>
      TableIO.commitAs(df, t, iter, counters)
      TableIO.read(df.sparkSession, t, Some(iter)).get
    case None => df.localCheckpoint(eager = eager)
  }

  private val FingerprintKey = "inputFingerprint"

  def fingerprintCounters(fp: Option[Long]): Map[String, Long] =
    fp.map(f => Map(FingerprintKey -> f)).getOrElse(Map.empty)

  /** Order-independent content fingerprint of an input frame: wrapped SUM
    * and XOR of per-row xxhash64 over every column, mixed with the row
    * count. Sum AND xor: xor alone cancels any row occurring an even
    * number of times, so two edge lists like {A,A,C} and {B,B,C} — equal
    * counts, different content — would collide and silently defeat the
    * stale-resume guard; the sum term is multiset-sensitive. The sum runs
    * in decimal(38,0) (ANSI-safe — a long sum of 64-bit hashes overflows
    * almost immediately) and wraps to 64 bits driver-side. One aggregate
    * scan of `df` — callers resuming an EXPENSIVE input plan should
    * fingerprint a cheap upstream instead (see duplicateClusters). */
  def fingerprint(df: DataFrame): Long = {
    import org.apache.spark.sql.functions._
    val h = xxhash64(df.columns.map(col): _*)
    val r = df.agg(
      sum(h.cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("s"),
      coalesce(bit_xor(h), lit(0L)).as("x"),
      count(lit(1)).as("n")).head()
    val s = if (r.isNullAt(0)) 0L else r.getDecimal(0).toBigInteger.longValue()
    (s * 31L + r.getLong(1)) * 31L + r.getLong(2)
  }

  /** Resume point: the largest committed iteration ≤ `maxIter`, with its
    * data. None when no state dir or nothing committed yet.
    *
    * When `fingerprint` is given, it is validated against the
    * `inputFingerprint` recorded by iteration 0's pin — resuming a dir
    * written for DIFFERENT input fails loudly instead of silently
    * returning stale labels/ranks. Without it, the caller owns keying the
    * dir to its input (mismatched resume is undefined). */
  def resume(spark: SparkSession, table: Option[String], maxIter: Long,
             fingerprint: Option[Long] = None): Option[(Long, DataFrame)] =
    table.flatMap { t =>
      TableIO.listSnapshots(t).filter(_ <= maxIter).lastOption.map { id =>
        fingerprint.foreach { fp =>
          val recorded = TableIO.readManifest(t, 0L).counters.get(FingerprintKey)
          require(recorded.nonEmpty,
            s"durable state at $t predates fingerprinting — cannot validate " +
              "it was written for this input; delete the dir to recompute")
          require(recorded.contains(fp),
            s"durable state at $t was written for a DIFFERENT input " +
              s"(fingerprint ${recorded.get} != $fp) — refusing to resume " +
              "stale iteration state; delete the dir to recompute. Note: a " +
              "fingerprint ALGORITHM change across engine versions (r5 " +
              "moved from xor*31+n to (sum*31+xor)*31+n) also trips this " +
              "check on identical input — deleting the dir is the expected " +
              "upgrade step in that case")
        }
        id -> TableIO.read(spark, t, Some(id)).get
      }
    }
}
