package graft.operators

import graft.functions.GraftFunctions._
import graft.state.{DigestIndex, SeenStore, TableIO}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Multi-round crawl driver: frontier → schedule → fetch (offline: join the
  * pages table, SURVEY.md S4) → byte-identical text extraction → digest
  * dedup → link discovery → seen-set increment, with per-round snapshot
  * commits and lineage counters (the reference's counters model, SURVEY.md
  * A3, as deterministic per-round sums instead of rate counters).
  *
  * Frontier rows: (url STRING, depth INT, warc_ts TIMESTAMP) where warc_ts
  * is the discovery recency used by the priority order (north_star:
  * depth asc, budget rank, warc_ts desc).
  *
  * Nothing is silently dropped (the reference never loses a record between
  * its channel stages, /root/reference/warc.go:58-90): candidates that pass
  * the seen+robots gates but lose the politeness budget race are *deferred*
  * — they re-enter the next round's frontier and compete again under the
  * priority order. Only robots-disallowed and already-seen urls leave the
  * pipeline for good.
  */
object Crawl {

  final case class RoundOutput(
      fetched: DataFrame,
      nextFrontier: DataFrame,
      newSeen: DataFrame,
      counters: Map[String, Long],
      release: () => Unit)

  final case class CrawlResult(
      rounds: Vector[Map[String, Long]],
      allFetched: DataFrame)

  /** The pages table as "the web": keyed by canonical url (one page per
    * canonical url, first capture wins deterministically). First-wins as a
    * lexicographic min(struct) AGGREGATE, not a row_number window: the min
    * is partially aggregated map-side, so the exchange carries at most
    * |distinct urls| rows per task instead of every capture's full html —
    * at web scale (many captures per url) the window form ships the whole
    * corpus through one shuffle to immediately discard the non-first rows.
    * Order = (page_ts, html, text, lang) lexicographic: earliest capture
    * wins, payload bytes break exact-timestamp ties deterministically. */
  def asWeb(pages: DataFrame): DataFrame =
    Frontier.canonicalize(pages)
      .groupBy(col("url_norm"))
      .agg(min(struct(col("warc_ts").as("page_ts"), col("html"),
        col("text"), col("lang"))).as("w"))
      .select(col("url_norm"), col("w.page_ts").as("page_ts"),
        col("w.html").as("html"), col("w.text").as("text"), col("w.lang").as("lang"))

  /** A3 global counters over a round's captures. Exposed as expressions so
    * `crawl` can ride them on the round's ONE materialization via
    * `observe` — no separate aggregation job per round. */
  private val counterAggs = Seq(
    count(lit(1)).as("fetched"),
    sum(when(col("is_revisit"), 1L).otherwise(0L)).as("revisits"),
    sum(when(col("text_ok"), 0L).otherwise(1L)).as("text_mismatches"),
    sum(col("payload_len")).as("payload_bytes"),
    sum(when(col("is_revisit"), col("payload_len")).otherwise(0L)).as("dedupe_saved_bytes"))

  private def countersFromObs(m: Map[String, Any]): Map[String, Long] =
    Seq("fetched", "revisits", "text_mismatches", "payload_bytes", "dedupe_saved_bytes")
      .map(k => k -> Option(m.getOrElse(k, null)).map(_.asInstanceOf[Long]).getOrElse(0L))
      .toMap

  private def countersFromRow(row: org.apache.spark.sql.Row): Map[String, Long] = Map(
    "fetched" -> row.getLong(0),
    "revisits" -> Option(row.get(1)).map(_.asInstanceOf[Long]).getOrElse(0L),
    "text_mismatches" -> Option(row.get(2)).map(_.asInstanceOf[Long]).getOrElse(0L),
    "payload_bytes" -> Option(row.get(3)).map(_.asInstanceOf[Long]).getOrElse(0L),
    "dedupe_saved_bytes" -> Option(row.get(4)).map(_.asInstanceOf[Long]).getOrElse(0L))

  /** One frontier round. `web` must be the asWeb() shape. Seen-state comes
    * from either `seenStore` (the partitioned scale path) or `seen` (an
    * in-memory DataFrame for small crawls/tests) — store wins if both. */
  def round(
      frontier: DataFrame,
      seen: Option[DataFrame],
      web: DataFrame,
      robots: Option[DataFrame],
      politeness: Option[DataFrame],
      cfg: Frontier.Config,
      withCounters: Boolean = true,
      seenStore: Option[SeenStore.Store] = None,
      cdx: Option[DataFrame] = None): RoundOutput = {

    val canonical = Frontier.canonicalize(frontier)
      .select(col("url_norm"), col("host"), col("url_hash"), col("depth"), col("warc_ts"))
    // within-round first-discovery-wins per url
    val batchDeduped = Frontier.firstSeenWins(canonical, col("url_hash"),
      Seq(col("depth").asc, col("warc_ts").desc, col("url_norm").asc))
    val filtered = seenStore match {
      case Some(st) => st.filterUnseen(batchDeduped)
      case None =>
        SeenStore.Filtered(Frontier.dedupeAgainstSeen(batchDeduped, seen, cfg), () => ())
    }
    val allowed = (robots match {
      case Some(r) => Frontier.applyRobots(filtered.result, r, cfg)
      case None => filtered.result
    }).persist(StorageLevel.MEMORY_AND_DISK)
    val scheduled = Frontier.schedule(allowed, politeness, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // politeness carryover: allowed-but-unscheduled candidates re-enter the
    // next frontier (priority-queue semantics: deferral, not loss)
    val deferred = allowed.join(scheduled.select("url_hash"), Seq("url_hash"), "left_anti")
      .select(col("url_norm").as("url"), col("depth"), col("warc_ts"))

    // fetch = equi-join against the web on canonical url; unfetchable urls
    // (404s) drop out here
    val fetched0 = scheduled.join(web, Seq("url_norm"), "inner")
      .withColumn("extracted_text", http_extract_text(col("html")))
      .withColumn("text_ok", col("extracted_text") === col("text"))
      .withColumn("payload", encode(col("extracted_text"), "UTF-8"))
      .withColumn("payload_len", length(col("payload")).cast("long"))
      .withColumn("payload_digest", sha1_base32(col("payload")))
      .drop("payload")
    // refers_to_ts must be the first capture's *capture* time (page_ts) so a
    // revisit's WARC-Refers-To id matches the response record it references;
    // with a CDX index, local-then-remote precedence applies (J3)
    val fetched = (cdx match {
      case Some(c) => Frontier.digestDedupWithCdx(fetched0, c, cfg, captureTsCol = "page_ts")
      case None => Frontier.digestDedup(fetched0, cfg, captureTsCol = "page_ts")
    }).persist(StorageLevel.MEMORY_AND_DISK)

    // link discovery from non-revisit fetches; discovery recency = the
    // linking page's capture time
    val links = fetched
      .filter(!col("is_revisit"))
      .select(
        explode(expr("regexp_extract_all(extracted_text, '<a href=\"([^\"]+)\"', 1)")).as("url"),
        (col("depth") + 1).as("depth"),
        col("page_ts").as("warc_ts"))
    val nextFrontier = links.unionByName(deferred)

    val newSeen = scheduled.select(col("url_hash"), col("url_norm"))

    val counters: Map[String, Long] =
      if (!withCounters) Map.empty
      else countersFromRow(fetched.agg(counterAggs.head, counterAggs.tail: _*).collect()(0))

    val release = () => {
      allowed.unpersist(); scheduled.unpersist(); fetched.unpersist()
      filtered.release()
    }
    RoundOutput(fetched, nextFrontier, newSeen, counters, release)
  }

  /** Run `maxRounds` rounds from a seed list. When `stateDir` is given, the
    * seen set grows by O(|new|) append-only increments (SeenStore) and the
    * frontier is snapshotted per round; both are keyed by the round number,
    * so resume picks the largest round committed in BOTH tables — a crash
    * between the two commits replays that round exactly (north_rule exact
    * resume), never against a stale frontier. */
  def crawl(
      spark: SparkSession,
      web: DataFrame,
      seeds: Seq[String],
      maxRounds: Int,
      robots: Option[DataFrame] = None,
      politeness: Option[DataFrame] = None,
      cfg: Frontier.Config = Frontier.Config(),
      stateDir: Option[String] = None,
      warcDir: Option[String] = None,
      cdx: Option[DataFrame] = None,
      digestIndex: Option[DigestIndex.Ref] = None): CrawlResult = {
    import spark.implicits._

    val store = stateDir.map(d => SeenStore(d + "/seen",
      SeenStore.Config(cfg.seenParts, cfg.seenFpp, cfg.seenSketch)))
    val frontierTable = stateDir.map(_ + "/frontier")

    // resume point: largest round present in BOTH the frontier snapshots
    // and the seen increments (ids are contiguous from 0)
    val resumedRound: Option[Long] = (store, frontierTable) match {
      case (Some(st), Some(ft)) =>
        val seenIds = st.committedIds.toSet
        TableIO.listSnapshots(ft).filter(seenIds.contains).lastOption
      case _ => None
    }

    var seen: Option[DataFrame] = None // in-memory path only
    val startRound = resumedRound.map(_.toInt + 1).getOrElse(0)

    var frontier: DataFrame = resumedRound match {
      case Some(id) => TableIO.read(spark, frontierTable.get, Some(id)).get
      case None =>
        seeds.toDF("url")
          .withColumn("depth", lit(0))
          .withColumn("warc_ts", lit(new java.sql.Timestamp(PagesGenTs.base)))
    }

    var allCounters = Vector.empty[Map[String, Long]]
    val fetchedTable = stateDir.map(_ + "/fetched")
    // durable resume restores the already-captured rounds too (they are
    // TableIO snapshots keyed by round id), so CrawlResult.fetched is the
    // whole crawl's captures, not just the rounds after the restart
    var allFetched: Option[DataFrame] = (fetchedTable, resumedRound) match {
      case (Some(ft), Some(last)) =>
        TableIO.listSnapshots(ft).filter(_ <= last)
          .flatMap(id => TableIO.read(spark, ft, Some(id)))
          .reduceOption(_ unionByName _)
      case _ => None
    }

    // Frontier emptiness is TRACKED, not queried: seeds are driver-side, a
    // durable resume has the manifest's rowCount, and each round's next
    // frontier reports its count through the round's one materialization —
    // the old `frontier.isEmpty` was a whole extra job per round
    var frontierCount: Long = resumedRound match {
      case Some(id) => TableIO.readManifest(frontierTable.get, id).rowCount
      case None => seeds.size.toLong
    }

    var r = startRound
    var done = false
    while (r < startRound + maxRounds && !done) {
      if (frontierCount == 0) done = true
      else {
        // cross-round digest dedup: the bucketed index accumulates every
        // prior round's first-captures (the reference's crawl-lifetime
        // dedupe map); a static CDX (a real remote archive) unions in
        // with an index configured, round 0 (nothing appended yet) still
        // runs the SAME dedup-with-cdx plan over an empty frame, so every
        // round's output schema is identical (the accumulator unions them)
        val idxCdx = digestIndex.map(r =>
          DigestIndex.cdx(spark, r).getOrElse(DigestIndex.emptyCdx(spark)))
        val roundCdx = (cdx, idxCdx) match {
          case (Some(c), Some(idx)) => Some(c.unionByName(idx))
          case (c, idx) => c.orElse(idx)
        }
        val out = round(frontier, seen, web, robots, politeness, cfg,
          withCounters = false, seenStore = store, cdx = roundCdx)
        // Pin this round's rows BEFORE release() so the round cache can be
        // dropped below. Durable (stateDir set): TableIO snapshot keyed by
        // round — survives executor loss and feeds resume; committed FIRST
        // so a crash before the frontier/seen commits leaves only an
        // orphan that the replayed round idempotently overwrites.
        // In-memory: eager localCheckpoint (truncated lineage, one compact
        // RDD per round). Either way the accumulator is a shallow union of
        // leaf scans, never a chain of full per-round pipelines — and the
        // A3 counters ride this SAME materialization via observe (the old
        // separate aggregation job per round is gone).
        val obs = org.apache.spark.sql.Observation()
        val observed = out.fetched.observe(obs, counterAggs.head, counterAggs.tail: _*)
        val roundFetched = fetchedTable match {
          case Some(_) => graft.state.Durable.pin(observed, fetchedTable, r.toLong)
          case None => observed.localCheckpoint(true)
        }
        val counters = countersFromObs(obs.get)
        allCounters :+= counters
        // optional archival sink: the round's captures as rotated WARC
        // (responses + truncated revisit records, K3 semantics)
        warcDir.foreach(d =>
          graft.sources.WarcIO.writeFetched(roundFetched, s"$d/round-$r"))
        allFetched = allFetched match {
          case None => Some(roundFetched)
          case Some(prev) =>
            val merged = prev.unionByName(roundFetched)
            // like the seen accumulator below: the union of per-round
            // checkpoint leaves is O(1) to extend but O(rounds) to ANALYZE —
            // collapse it periodically so a long in-memory crawl plans O(1)
            // per round. Durable mode keeps the plain union: its leaves are
            // parquet scans (fault-tolerant), and a localCheckpoint here
            // would silently trade that away for executor-pinned RDDs.
            Some(
              if (fetchedTable.isEmpty && (r + 1) % 8 == 0) merged.localCheckpoint(true)
              else merged)
        }
        // O(|new|) index growth, like the seen increments; keyed by round so
        // a crash-replay of this round overwrites its own partition instead
        // of appending duplicates
        digestIndex.foreach(DigestIndex.append(roundFetched, _, r.toLong))
        (store, frontierTable) match {
          case (Some(st), Some(ft)) =>
            val snap = TableIO.commitAs(out.nextFrontier, ft, r.toLong, Map("round" -> r.toLong))
            frontierCount = snap.rowCount // manifest metadata, no extra scan
            st.append(out.newSeen, r.toLong, counters)
            // periodic log-structured compaction keeps the probe chain O(1)
            // in rounds (a 1,000-round crawl would otherwise pay 1,000
            // sketch checks per candidate)
            if (cfg.seenCompactEvery > 0 && (r + 1) % cfg.seenCompactEvery == 0) {
              st.compact(spark)
              st.gc() // drop the superseded generation's blobs
            }
            frontier = TableIO.read(spark, ft, Some(r.toLong)).get
          case _ =>
            // ONE eager localCheckpoint materializes the seen increment AND
            // the next frontier (tagged union, split back by filter over the
            // checkpointed leaf): truncates the per-round plan lineage
            // (digestDedup's union branches would otherwise double the
            // logical plan every round), materializes before release(), and
            // carries the next frontier's row count as an observed metric —
            // this round's ONLY other job besides the capture pin
            val stObs = org.apache.spark.sql.Observation()
            val ck = out.newSeen
              .select(lit(1).as("__t"), col("url_hash"), col("url_norm"))
              .unionByName(out.nextFrontier.select(lit(2).as("__t"), col("url"),
                col("depth"), col("warc_ts")), allowMissingColumns = true)
              .observe(stObs, count(when(col("__t") === 2, 1)).as("nf"))
              .localCheckpoint(true)
            val newSeen = ck.filter(col("__t") === 1).select("url_hash", "url_norm")
            val merged = seen match {
              case None => newSeen
              case Some(s) => s.unionByName(newSeen)
            }
            // the accumulator is a union of per-round checkpoint leaves:
            // O(1) per round to extend, but its ANALYSIS cost grows with
            // rounds — collapse it periodically so a long in-memory crawl
            // plans O(1) instead of O(rounds) per round (the durable path
            // reads one table and never grows)
            seen = Some(
              if ((r + 1) % 8 == 0) merged.localCheckpoint(true) else merged)
            frontier = ck.filter(col("__t") === 2).select("url", "depth", "warc_ts")
            frontierCount = stObs.get("nf").asInstanceOf[Long]
        }
        // round caches (allowed/scheduled/fetched) are no longer referenced:
        // everything downstream reads the checkpoint or durable state
        out.release()
        r += 1
      }
    }
    CrawlResult(allCounters, allFetched.getOrElse(spark.emptyDataFrame))
  }
}

/** Shared base timestamp (PagesGen.BaseEpochSec) without a main-source
  * dependency cycle. */
private object PagesGenTs {
  val base: Long = graft.sources.PagesGen.BaseEpochSec * 1000L
}
