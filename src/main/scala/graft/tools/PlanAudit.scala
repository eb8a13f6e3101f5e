package graft.tools

import graft.Queries
import graft.operators.{Crawl, Frontier}
import graft.sources.PagesGen
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Regenerates docs/PLAN_AUDIT_r*.txt: the physical plans of the
  * judged-expensive queries, each with the property the plan must exhibit
  * (pushdown reached the scan, WindowGroupLimit partial top-k fired,
  * broadcasts chosen, the seen probe is a narrow codegen filter, no
  * row blow-ups). Run: `runMain graft.tools.PlanAudit <outFile>`.
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("docs/PLAN_AUDIT_r2.txt")
    val sf = "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder

    def section(name: String, expectation: String, df: DataFrame): Unit = {
      sb.append(s"===== $name =====\n")
      sb.append(s"-- expect: $expectation\n")
      sb.append(df.queryExecution.executedPlan.toString)
      sb.append("\n\n")
    }
    def q(name: String): DataFrame = Queries.queries(name)(spark, sf)

    section("f04_politeness_schedule",
      "WindowGroupLimit Partial before both rank exchanges; only scheduling columns in exchanges (no payload text)",
      q("f04_politeness_schedule"))

    section("f08_seen_partitioned",
      "ONE exchange on __seen_part + narrow codegen seen_contains filter; NO bloom subquery, NO join, NO driver-side sketch (probe now runs over the COMPACTED single bank)",
      q("f08_seen_partitioned"))

    section("f13_cross_round_index",
      "the cross-round digest index side is a BUCKETED scan: last-capture aggregate + dedup join with NO exchange above the index scan (candidates side exchanges once on payload_digest)",
      q("f13_cross_round_index"))

    section("f09_cdx_dedup",
      "local first-wins window + ONE left join against the aggregated CDX last-capture dim; exemptions as codegen filters",
      q("f09_cdx_dedup"))

    section("s01_ann_brute",
      "broadcast of the SMALL query side (BroadcastNestedLoopJoin), corpus scanned once, WindowGroupLimit partial top-k",
      q("s01_ann_brute"))

    section("s02_ann_ivf",
      "narrow argmax_cell projection for assignment (NO exchange between scan and cell id), broadcast centroids, probed-cells join",
      q("s02_ann_ivf"))

    section("s03_ann_quantized",
      "same shape as s01 (broadcast query side, one corpus scan, WindowGroupLimit partial top-k) with the narrow quantize projection fused into the scan",
      q("s03_ann_quantized"))

    section("d02_minhash_pairs",
      "one-pass minhash_sig kernel, band-bucket groupBy (never all-pairs), capped collect_list buckets; verify joins ship per-doc DISTINCT shingle SETS (computed once per doc, set-intersect per pair — never re-shingling text per pair)",
      q("d02_minhash_pairs"))

    section("f17_host_rank",
      "integer fixed-point PageRank: per-iteration groupBy(dst)+join over checkpointed leaf inputs; no float aggregation anywhere (order-independent by construction)",
      q("f17_host_rank"))

    section("d04_embedding_neardup",
      "banded hyperplane_sigs kernel (8 tables x 10 bits), (table,sig) bucket groupBy, exact cosine verify; planted deltas are pure arithmetic (no hash calls)",
      q("d04_embedding_neardup"))

    section("t03_langid",
      "single narrow lang_id kernel projection (was 4 interpreted HOF passes)",
      q("t03_langid"))

    section("m02_media_transform",
      "per-partition batch mapPartitions (decoder amortized), no shuffle before the transform",
      q("m02_media_transform"))

    section("d06_line_dedup",
      "narrow chunking projection; first-wins as partial_min aggregate on the line (map-side combine collapses mega-lines; NO Window — window groups can't be skew-split); keeper join back on the UNIQUE (doc,idx) key; per-doc re-aggregate",
      q("d06_line_dedup"))

    section("d07_decontam",
      "eval n-gram set BROADCAST (BroadcastHashJoin on g); training side narrow explode, no shuffle before the per-doc count",
      q("d07_decontam"))

    section("t07_repetition",
      "explode -> partial-aggregated groupBy(id, gram) -> groupBy(id); map-side combine on both, exchanges carry the doc id only",
      q("t07_repetition"))

    section("t08_seq_pack",
      "two-phase distributed prefix sum: range partition + narrow per-partition running sum (RDD scan), NO single-task Window.orderBy; final rank bounded per sequence",
      q("t08_seq_pack"))

    section("t11_bpe_tokens",
      "single narrow bpe_count kernel projection over the documents scan (codegen, no HOFs, no shuffle before the sort)",
      q("t11_bpe_tokens"))

    section("m03_byte_packing",
      "deterministic id-domain prefix groups: ONE hash exchange on __g + within-partition sort, identity partitioner to byte-bounded buckets (never sampled range boundaries, never keyed on physical partition ids)",
      q("m03_byte_packing"))

    section("f18_authority_schedule",
      "politeness schedule (WindowGroupLimit partials) + BROADCAST authority dim + TakeOrderedAndProject global wave cap (map-side K-row heaps, never a single-task Window)",
      q("f18_authority_schedule"))

    section("m04_audio_decode",
      "per-partition batch mapPartitions audio parse (no shuffle before the sort); features in exact integer sums",
      q("m04_audio_decode"))

    // the integrated crawl-round core (f07's per-round plan, unpersisted):
    // canonicalize -> in-batch first-wins -> robots broadcast gate ->
    // two-phase schedule -> fetch join -> digest-dedup window
    {
      import spark.implicits._
      val web = Crawl.asWeb(PagesGen.pages(spark, 2000, 20, 42L).toDF())
      val politeness = (0 until 7).map(h => (s"host$h.example", 1 + h % 3)).toDF("host", "budget")
      val frontier = PagesGen.seeds(2000, 60, 20, 42L).toDF("url")
        .withColumn("depth", lit(0))
        .withColumn("warc_ts", lit(new java.sql.Timestamp(PagesGen.BaseEpochSec * 1000L)))
      val canonical = Frontier.canonicalize(frontier)
        .select(col("url_norm"), col("host"), col("url_hash"), col("depth"), col("warc_ts"))
      val deduped = Frontier.firstSeenWins(canonical, col("url_hash"),
        Seq(col("depth").asc, col("warc_ts").desc, col("url_norm").asc))
      val scheduled = Frontier.schedule(deduped, Some(politeness),
        Frontier.Config(defaultBudget = 4, saltBuckets = 8))
      val fetched = Frontier.digestDedup(
        scheduled.join(web, Seq("url_norm"), "inner")
          .withColumn("extracted_text", graft.functions.GraftFunctions.http_extract_text(col("html")))
          .withColumn("payload", encode(col("extracted_text"), "UTF-8"))
          .withColumn("payload_len", length(col("payload")).cast("long"))
          .withColumn("payload_digest", graft.functions.GraftFunctions.sha1_base32(col("payload")))
          .drop("payload"),
        Frontier.Config(), captureTsCol = "page_ts")
      section("f07_round_core",
        "broadcast robots/politeness dims; WindowGroupLimit on every rank; fetch join keeps html out of the rank exchanges; digest window after the join",
        fetched)
    }

    // the BENCH frontier path over a real SeenStore (small here; the plan
    // shape is what matters: probe exchange + codegen filter + pruned ranks)
    {
      val cfg = Frontier.Config(defaultBudget = 64, saltBuckets = 1)
      val frontier = PagesGen.urls(spark, 20000, 100, 42L, partitions = 8)
      val canon = Frontier.canonicalize(frontier)
        .select(col("url_norm"), col("url_hash"), col("host"), col("warc_ts"), col("depth"))
      val seenDir = java.nio.file.Files.createTempDirectory("graft-audit-seen").toString
      val store = graft.state.SeenStore(seenDir, graft.state.SeenStore.Config(parts = 8))
      store.append(canon.filter(pmod(col("url_hash"), lit(10L)) < 3).select("url_hash"), 0L)
      val plan = Frontier.schedule(store.filterUnseen(canon).result, None, cfg)
      section("bench_headline_schedule",
        "the BENCH frontier path: seen_contains probe + single host exchange with WindowGroupLimit Partial map-side prune (salted pre-rank off)",
        plan)
    }

    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote $out (${sb.length} chars)")
    spark.stop()
  }
}
