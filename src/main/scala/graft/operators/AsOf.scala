package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — the temporal lookup Spark has no built-in
  * operator for, and the frontier's recrawl primitive: "the latest capture
  * of this url at or before time T" drives staleness-based re-scheduling
  * in a continuous crawl (the north_star's frontier refreshes pages, it
  * doesn't fetch them once). The same shape answers CDX-style temporal
  * queries ("what did we hold for this url as of date D?").
  *
  * Implementation is union + tag + one ordered window pass:
  * every row (left probe or right capture) routes to its key's partition
  * ONCE, sorted by (ts, tag) so a capture at exactly the probe time is
  * visible to it; `last(right_payload, ignoreNulls)` then assigns each
  * probe the newest capture at-or-before it. Compared to the naive
  * equi-join + filter + max_by, there is NO join expansion (a probe × its
  * key's full history) and exactly ONE exchange total. Hot keys stay one
  * window partition — as-of order is inherently per-key sequential — but
  * the group size is the key's own history length (bounded in practice:
  * captures per url), never the corpus.
  */
object AsOf {

  /** For every left row, attach the latest right row with
    * `right(rightTs) <= left(leftTs)` on the same `key` (nulls when the
    * key has no capture that old). Output: all left columns, right value
    * columns, plus `asof_<rightTs>` = the matched capture's timestamp.
    * Right value columns must not collide with left columns. For
    * deterministic output when several right rows share (key, ts), the
    * largest payload struct wins (document or pre-dedupe for a specific
    * tie-break). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val rightCols = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val overlap = rightCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"right value columns collide with left columns: $overlap")

    val lStruct = struct(left.columns.map(col).toSeq: _*)
    val rStruct = struct((rightTs +: rightCols).map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val lT = left.select(col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__tag"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    val rT = right.select(col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__tag"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r"))

    // captures sort before probes at equal ts (tag 0 < 1) → `<=` semantics;
    // among same-ts captures the struct order makes `last` deterministic
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__tag").asc, col("__r").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lT.unionByName(rT)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        left.columns.map(c => col(s"__l.$c").as(c)).toSeq ++
          rightCols.map(c => col(s"__match.$c").as(c)) :+
          col(s"__match.$rightTs").as(s"asof_$rightTs"): _*)
  }

  /** Recrawl scheduling over a capture history: for each url in `probes`
    * (url_norm, probe_ts), the latest capture at-or-before probe_ts and a
    * staleness verdict — candidates with `stale = true` re-enter the
    * frontier (never captured, or captured before probe_ts - maxAgeSec). */
  def recrawlCandidates(probes: DataFrame, captures: DataFrame,
                        maxAgeSec: Long): DataFrame = {
    val joined = asofJoin(probes, captures, "url_norm", "probe_ts", "capture_ts")
    joined.withColumn("stale",
      col("asof_capture_ts").isNull ||
        col("asof_capture_ts") < col("probe_ts") - expr(s"INTERVAL $maxAgeSec SECOND"))
  }
}
