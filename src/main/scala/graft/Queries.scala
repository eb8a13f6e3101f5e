package graft

import graft.functions.GraftFunctions._
import graft.operators._
import graft.sources.PagesGen
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The driver-harness query surface: every operator family from SURVEY.md
  * §2 (+ the training-data ops) exposed as a (SparkSession, sfDir) =>
  * DataFrame, with a DuckDB-equivalent oracle where the op is
  * SQL-expressible. Column names and row order match the oracles exactly.
  *
  * Float discipline: aggregate sums go through DECIMAL(38,x) (exact,
  * order-independent) and are cast to DOUBLE at the end; cosine scores are
  * sequential double folds, which DuckDB's list_sum/list_transform
  * reproduces bitwise (verified empirically).
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ---------------------------------------------------------------------
  // pages-lite: the Common-Crawl-style frontier input derived
  // deterministically from the documents table, with dirty-URL variants.
  // The oracle CTE `p` below mirrors these expressions 1:1.
  // ---------------------------------------------------------------------
  private def pagesLite(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").selectExpr(
      "doc_id",
      "doc_id % 89 AS path_id",
      "(doc_id % 89) % 7 AS host_id",
      "CAST(doc_id % 3 AS INT) AS depth",
      "TIMESTAMP '2022-03-20 03:55:45' + make_interval(0, 0, 0, 0, 0, 0, (doc_id * 7) % 100000) AS warc_ts",
      """CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN concat('HTTPS://HOST', CAST((doc_id % 89) % 7 AS STRING), '.EXAMPLE/doc/', CAST(doc_id % 89 AS STRING))
           WHEN 1 THEN concat('https://host', CAST((doc_id % 89) % 7 AS STRING), '.example:443/doc/', CAST(doc_id % 89 AS STRING))
           WHEN 2 THEN concat('https://host', CAST((doc_id % 89) % 7 AS STRING), '.example/./doc/', CAST(doc_id % 89 AS STRING))
           ELSE concat('https://host', CAST((doc_id % 89) % 7 AS STRING), '.example/doc/', CAST(doc_id % 89 AS STRING), '#s')
         END AS url""",
      "text")

  private val pSql: String =
    """SELECT doc_id,
      |  doc_id % 89 AS path_id,
      |  (doc_id % 89) % 7 AS host_id,
      |  CAST(doc_id % 3 AS INT) AS depth,
      |  TIMESTAMP '2022-03-20 03:55:45' + INTERVAL ((doc_id * 7) % 100000) SECOND AS warc_ts,
      |  'https://host' || CAST((doc_id % 89) % 7 AS VARCHAR) || '.example/doc/' || CAST(doc_id % 89 AS VARCHAR) AS url_norm,
      |  'host' || CAST((doc_id % 89) % 7 AS VARCHAR) || '.example' AS host,
      |  text
      |FROM documents""".stripMargin

  /** Planted duplicate clusters (docs texts are all-distinct and short, so
    * dup detection needs seeded dups ≥ the 2048-byte threshold). */
  private val text2Spark =
    "CASE WHEN doc_id % 11 < 3 THEN repeat(concat('dup-block-', CAST(doc_id % 7 AS STRING), ' '), 250) ELSE text END"
  private val text2Duck =
    "CASE WHEN doc_id % 11 < 3 THEN repeat('dup-block-' || CAST(doc_id % 7 AS VARCHAR) || ' ', 250) ELSE text END"

  private def fw(s: SparkSession, dir: String): DataFrame = {
    val canon = Frontier.canonicalize(pagesLite(s, dir))
    Frontier.firstSeenWins(canon, col("url_norm"),
      Seq(col("warc_ts").asc, col("doc_id").asc))
  }

  /** Shared by f09/f10: pagesLite with planted dup bodies + per-doc urls,
    * deduped against a synthetic CDX index (docs with doc_id%5==0 are
    * "remotely archived"; doc_id%10==0 adds a warc/revisit entry that must
    * be ignored per /root/reference/dedupe.go:59). */
  private def cdxDeduped(s: SparkSession, dir: String): DataFrame = {
    val p = pagesLite(s, dir)
      .withColumn("text2", expr(text2Spark))
      .withColumn("url_norm", concat(url_normalize(col("url")), lit("?d="), col("doc_id")))
      .withColumn("payload_digest", sha2(col("text2"), 256))
      .withColumn("payload_len", length(encode(col("text2"), "UTF-8")).cast("long"))
    val archived = p.filter(col("doc_id") % 5 === 0).select(
      col("payload_digest"),
      concat(lit("https://archive.example/doc/"), col("doc_id")).as("target_uri"),
      expr("TIMESTAMP '2022-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)").as("capture_ts"),
      lit("text/html").as("record_type"))
    val revisitNoise = p.filter(col("doc_id") % 10 === 0).select(
      col("payload_digest"),
      concat(lit("https://bogus.example/doc/"), col("doc_id")).as("target_uri"),
      expr("TIMESTAMP '2023-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)").as("capture_ts"),
      lit("warc/revisit").as("record_type"))
    operators.Frontier.digestDedupWithCdx(p, archived.unionByName(revisitNoise),
      operators.Frontier.Config())
  }

  private val fwSql: String =
    s"""p AS ($pSql),
       |fw AS (
       |  SELECT doc_id, path_id, host_id, depth, warc_ts, url_norm, host FROM (
       |    SELECT p.*, row_number() OVER (PARTITION BY url_norm ORDER BY warc_ts, doc_id) AS __rn FROM p)
       |  WHERE __rn = 1)""".stripMargin

  // ---------------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- relational core (scan/filter/agg/join/window/sort, SURVEY §2) ---
    "q01_pricing_summary" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(38,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(38,4)")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")),

    "q02_filter_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(38,4)")).cast("double").as("revenue"))
        .orderBy("l_returnflag")),

    "q03_region_revenue" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = broadcast(t(s, dir, "nation"))
      val region = broadcast(t(s, dir, "region"))
      orders
        .join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(38,4)")).cast("double").as("revenue"))
        .orderBy("r_name")
    }),

    "q04_topk_orders" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)),

    "q05_window_top_orders" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),

    "q06_distinct_counts" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    "q07_events_hourly" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(38,6)")).cast("double").as("total"))
        .select(col("w.start").as("hour"), col("event_type"), col("n"), col("total"))
        .orderBy("hour", "event_type")),

    "q08_semi_join" -> ((s, dir) => {
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 100000)
        .select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer")
        .join(bigOrders, Seq("c_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment")
    }),

    "q09_anti_join" -> ((s, dir) => {
      // customers with no large order (threshold near p99 so the anti side
      // is non-trivial at every scale factor)
      val orderCust = t(s, dir, "orders").filter(col("o_totalprice") > 450000)
        .select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer")
        .join(orderCust, Seq("c_custkey"), "left_anti")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
        .orderBy("n_name")
    }),

    // --- frontier (north_star ops over pages-lite) -----------------------
    "f01_canonicalize" -> ((s, dir) =>
      Frontier.canonicalize(pagesLite(s, dir))
        .select("doc_id", "url_norm", "host")
        .orderBy("doc_id")),

    "f02_urlseen_first_wins" -> ((s, dir) =>
      fw(s, dir)
        .select(col("url_norm"), col("doc_id").as("first_doc"))
        .orderBy("url_norm")),

    "f03_digest_dedup" -> ((s, dir) => {
      val p = pagesLite(s, dir)
        .withColumn("text2", expr(text2Spark))
        .withColumn("url_norm", concat(url_normalize(col("url")), lit("?d="), col("doc_id")))
        .withColumn("payload_digest", sha2(col("text2"), 256))
        .withColumn("payload_len", length(encode(col("text2"), "UTF-8")).cast("long"))
      Frontier.digestDedup(p, Frontier.Config())
        .select("doc_id", "is_revisit", "refers_to_url")
        .orderBy("doc_id")
    }),

    "f04_politeness_schedule" -> ((s, dir) => {
      val politeness = fw(s, dir).select("host", "host_id").distinct()
        .withColumn("budget", lit(1) + col("host_id") % 8)
        .select("host", "budget")
      Frontier.schedule(fw(s, dir), Some(politeness),
        Frontier.Config(defaultBudget = 4, saltBuckets = 8))
        .select("url_norm", "host", "batch_rank")
        .orderBy("host", "batch_rank")
    }),

    "f05_robots_filter" -> ((s, dir) => {
      import s.implicits._
      val robots = (0 until 7).filter(_ % 2 == 0)
        .map(h => (s"host$h.example", "User-agent: *\nDisallow: /doc/1"))
        .toDF("host", "body")
      Frontier.applyRobots(fw(s, dir), robots, Frontier.Config())
        .select("url_norm")
        .orderBy("url_norm")
    }),

    "f06_host_stats" -> ((s, dir) =>
      Frontier.canonicalize(pagesLite(s, dir))
        .groupBy("host")
        .agg(count(lit(1)).as("n_candidates"),
          countDistinct(col("url_norm")).as("n_unique"),
          min(col("doc_id")).as("first_doc"))
        .orderBy("host")),

    "f07_crawl_round" -> ((s, dir) => {
      // integrated pipeline over the synthetic web (rows-only oracle; the
      // exact-conformance oracle is the sequential simulation in ScalaTest)
      val web = Crawl.asWeb(PagesGen.pages(s, 3000, 20, 42L).toDF())
      val frontier = {
        import s.implicits._
        PagesGen.seeds(3000, 60, 20, 42L).toDF("url")
          .withColumn("depth", lit(0))
          .withColumn("warc_ts", lit(new java.sql.Timestamp(PagesGen.BaseEpochSec * 1000L)))
      }
      val out = Crawl.round(frontier, None, web, None, None,
        Frontier.Config(defaultBudget = 4, saltBuckets = 8), withCounters = false)
      out.fetched
        .select("url_norm", "depth", "batch_rank", "is_revisit", "text_ok")
        .orderBy("url_norm")
    }),

    "f09_cdx_dedup" -> ((s, dir) => {
      // local-then-remote dedupe precedence (J3): local first-wins beats the
      // CDX index; remote hits mark local firsts as cdx revisits
      Queries.cdxDeduped(s, dir)
        .select("doc_id", "is_revisit", "dedupe_source", "refers_to_url")
        .orderBy("doc_id")
    }),

    "f10_dedupe_savings" -> ((s, dir) =>
      // the reference's LocalDedupeTotal / RemoteDedupeTotal counter
      // semantics (bytes saved per dedupe source, client_test.go:863,950)
      Queries.cdxDeduped(s, dir)
        .filter(col("dedupe_source").isNotNull)
        .groupBy("dedupe_source")
        .agg(count(lit(1)).as("n_revisits"),
          sum(col("payload_len")).as("saved_bytes"))
        .orderBy("dedupe_source")),

    "f08_seen_partitioned" -> ((s, dir) => {
      // partitioned URL-seen filter (SeenStore): per-partition sketches
      // probed executor-side + exact anti-join fallback ≡ exact anti-join
      val seenDir = java.nio.file.Files.createTempDirectory("graft-f08-seen").toString
      val store = graft.state.SeenStore(seenDir, graft.state.SeenStore.Config(parts = 8))
      val all = fw(s, dir)
      store.append(all.filter(col("doc_id") % 3 === 0).select("url_hash"), 0L)
      store.filterUnseen(all).result
        .select("url_norm", "doc_id")
        .orderBy("url_norm")
    }),

    // --- dedup (training-data ops) ---------------------------------------
    "d01_exact_dedup" -> ((s, dir) =>
      Dedup.exact(t(s, dir, "documents").withColumn("text2", expr(text2Spark)), "text2")
        .select("doc_id", "is_dup", "keeper")
        .orderBy("doc_id")),

    "d02_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(
        t(s, dir, "documents").withColumn("text2", expr(text2Spark)),
        textCol = "text2", k = 3, numHashes = 64, bands = 16, threshold = 0.8)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")),

    "d03_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(
        t(s, dir, "documents").withColumn("text2", expr(text2Spark)),
        textCol = "text2", k = 3, maxHamming = 3)
        .orderBy("id_a", "id_b")),

    "d04_embedding_neardup" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      // plant near-dups: NOISE-perturbed copies (direction changes) of the
      // first 10 vectors — the case single-signature LSH mostly misses
      val planted = embs.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000).as("vec_id"),
          transform(col("embedding"), (x, i) =>
            (x + (pmod(xxhash64(col("vec_id"), i), lit(1000)).cast("float") / lit(10000.0f)
              - lit(0.05f))).cast("float")).as("embedding"))
      Dedup.embeddingPairs(embs.select("vec_id", "embedding").unionByName(planted),
        threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),

    // --- text analysis ----------------------------------------------------
    "t01_quality" -> ((s, dir) =>
      TextAnalysis.qualityMetrics(t(s, dir, "documents"))
        .select("doc_id", "n_chars_m", "alpha_chars", "digit_chars", "punct_chars", "n_tokens")
        .orderBy("doc_id")),

    "t02_lang_tokens" -> ((s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .groupBy("lang")
        .agg(count(lit(1)).as("docs"), sum(col("n_tokens")).as("total_tokens"))
        .orderBy("lang")),

    "t03_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    "t05_stopword_ratio" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.stopwordRatio(col("text")).as("stop_ratio"))
        .orderBy("doc_id")),

    "t04_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // --- similarity search ------------------------------------------------
    "s01_ann_brute" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(embs.filter(col("vec_id") < 5), embs, k = 10)
        .orderBy("query_id", "rank")
    }),

    "s02_ann_ivf" -> ((s, dir) => {
      val embs = t(s, dir, "embeddings")
      val cents = Similarity.initCentroids(embs, nCells = 16, "vec_id", "embedding")
      val indexed = Similarity.ivfAssign(embs, cents)
      Similarity.ivfTopK(embs.filter(col("vec_id") < 5), indexed, cents, k = 10, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // --- multimodal plumbing ----------------------------------------------
    "m01_media_meta" -> ((s, dir) => {
      // real image decode (ImageIO): synthetic PNGs whose dimensions derive
      // from doc_id, so the decoded metadata has a closed-form oracle
      import s.implicits._
      val media = t(s, dir, "documents").select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.syntheticPng(
          (10 + id % 30).toInt, (10 + (id * 7) % 20).toInt, id)))
        .toDF("doc_id", "media")
      Multimodal.decode(s, media).toDF()
        .select(col("doc_id"), col("meta.format").as("format"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.valid").as("valid"))
        .orderBy("doc_id")
    }),

    // --- WARC codec + byte-identical extraction ---------------------------
    "w01_warc_fixture" -> ((s, dir) => {
      import s.implicits._
      val in = new java.util.zip.GZIPInputStream(
        new java.io.FileInputStream("/root/reference/testdata/test.warc.gz"))
      val recs = try graft.codec.WarcCodec.readAll(in) finally in.close()
      recs.map(r => (r.warcType, r.contentLength,
          r.blockDigest == r.computedBlockDigest))
        .toDF("warc_type", "content_length", "digest_ok")
        .orderBy("warc_type")
    }),

    "x01_extract_conformance" -> ((s, dir) => {
      val pages = PagesGen.pages(s, 2000, 20, 42L).toDF()
      pages
        .withColumn("et", http_extract_text(col("html")))
        .agg(count(lit(1)).as("n_pages"),
          sum(when(col("et") === col("text"), 1L).otherwise(0L)).as("n_match"),
          sum(when(col("et") =!= col("text"), 1L).otherwise(0L)).as("n_mismatch"))
    })
  )

  // ---------------------------------------------------------------------

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price,
        | count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q02_filter_agg" ->
      """SELECT l_returnflag, count(*) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q03_region_revenue" ->
      """SELECT r_name, count(*) AS n_orders,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q04_topk_orders" ->
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100",

    "q05_window_top_orders" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
        | SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey) AS INT) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q06_distinct_counts" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        | count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q07_events_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q08_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q09_anti_join" ->
      """SELECT n_name, count(*) AS n FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f01_canonicalize" ->
      s"WITH p AS ($pSql)\nSELECT doc_id, url_norm, host FROM p ORDER BY doc_id",

    "f02_urlseen_first_wins" ->
      s"""WITH $fwSql
         |SELECT url_norm, doc_id AS first_doc FROM fw ORDER BY url_norm""".stripMargin,

    "f03_digest_dedup" ->
      s"""WITH p AS (
         | SELECT doc_id,
         |  'https://host' || CAST((doc_id % 89) % 7 AS VARCHAR) || '.example/doc/' || CAST(doc_id % 89 AS VARCHAR) || '?d=' || CAST(doc_id AS VARCHAR) AS u,
         |  TIMESTAMP '2022-03-20 03:55:45' + INTERVAL ((doc_id * 7) % 100000) SECOND AS warc_ts,
         |  $text2Duck AS text2
         | FROM documents),
         |e AS (
         | SELECT doc_id, u,
         |  row_number() OVER (PARTITION BY dg ORDER BY warc_ts, u) AS rn,
         |  first_value(u) OVER (PARTITION BY dg ORDER BY warc_ts, u) AS fu
         | FROM (SELECT doc_id, u, warc_ts, sha256(text2) AS dg,
         |        octet_length(encode(text2)) AS len FROM p)
         | WHERE len >= 2048 AND len > 0)
         |SELECT p.doc_id, coalesce(e.rn > 1, false) AS is_revisit,
         | CASE WHEN e.rn > 1 THEN e.fu END AS refers_to_url
         |FROM p LEFT JOIN e ON p.doc_id = e.doc_id ORDER BY p.doc_id""".stripMargin,

    "f04_politeness_schedule" ->
      s"""WITH $fwSql
         |SELECT url_norm, host, batch_rank FROM (
         | SELECT url_norm, host,
         |  CAST(row_number() OVER (PARTITION BY host ORDER BY depth, warc_ts DESC, url_norm) AS INT) AS batch_rank,
         |  1 + host_id % 8 AS budget
         | FROM fw)
         |WHERE batch_rank <= budget ORDER BY host, batch_rank""".stripMargin,

    "f05_robots_filter" ->
      s"""WITH $fwSql
         |SELECT url_norm FROM fw
         |WHERE NOT (host_id % 2 = 0 AND CAST(path_id AS VARCHAR) LIKE '1%')
         |ORDER BY url_norm""".stripMargin,

    "f09_cdx_dedup" ->
      s"""WITH p AS (
         | SELECT doc_id,
         |  'https://host' || CAST((doc_id % 89) % 7 AS VARCHAR) || '.example/doc/' || CAST(doc_id % 89 AS VARCHAR) || '?d=' || CAST(doc_id AS VARCHAR) AS u,
         |  TIMESTAMP '2022-03-20 03:55:45' + INTERVAL ((doc_id * 7) % 100000) SECOND AS warc_ts,
         |  $text2Duck AS text2
         | FROM documents),
         |h AS (SELECT doc_id, u, warc_ts, sha256(text2) AS dg,
         |       octet_length(encode(text2)) AS len FROM p),
         |e AS (
         | SELECT doc_id, dg,
         |  row_number() OVER w AS rn,
         |  first_value(u) OVER w AS fu
         | FROM h
         | WHERE len >= 2048 AND len > 0
         | WINDOW w AS (PARTITION BY dg ORDER BY warc_ts, u)),
         |cdx AS (
         | SELECT dg, uri FROM (
         |  SELECT sha256(text2) AS dg,
         |   'https://archive.example/doc/' || CAST(doc_id AS VARCHAR) AS uri,
         |   row_number() OVER (PARTITION BY sha256(text2)
         |     ORDER BY TIMESTAMP '2022-01-01 00:00:00' + INTERVAL (doc_id) SECOND DESC,
         |              'https://archive.example/doc/' || CAST(doc_id AS VARCHAR) DESC) AS rn
         |  FROM p WHERE doc_id % 5 = 0)
         | WHERE rn = 1)
         |SELECT h.doc_id,
         | CASE WHEN e.rn > 1 OR (e.rn = 1 AND cdx.dg IS NOT NULL) THEN true ELSE false END AS is_revisit,
         | CASE WHEN e.rn > 1 THEN 'local' WHEN e.rn = 1 AND cdx.dg IS NOT NULL THEN 'cdx' END AS dedupe_source,
         | CASE WHEN e.rn > 1 THEN e.fu WHEN e.rn = 1 AND cdx.dg IS NOT NULL THEN cdx.uri END AS refers_to_url
         |FROM h LEFT JOIN e ON h.doc_id = e.doc_id LEFT JOIN cdx ON e.dg = cdx.dg
         |ORDER BY h.doc_id""".stripMargin,

    "f10_dedupe_savings" ->
      s"""WITH p AS (
         | SELECT doc_id,
         |  'https://host' || CAST((doc_id % 89) % 7 AS VARCHAR) || '.example/doc/' || CAST(doc_id % 89 AS VARCHAR) || '?d=' || CAST(doc_id AS VARCHAR) AS u,
         |  TIMESTAMP '2022-03-20 03:55:45' + INTERVAL ((doc_id * 7) % 100000) SECOND AS warc_ts,
         |  $text2Duck AS text2
         | FROM documents),
         |h AS (SELECT doc_id, u, warc_ts, sha256(text2) AS dg,
         |       octet_length(encode(text2)) AS len FROM p),
         |e AS (
         | SELECT doc_id, dg, row_number() OVER w AS rn
         | FROM h WHERE len >= 2048 AND len > 0
         | WINDOW w AS (PARTITION BY dg ORDER BY warc_ts, u)),
         |cdx AS (SELECT DISTINCT sha256(text2) AS dg FROM p WHERE doc_id % 5 = 0),
         |r AS (
         | SELECT h.doc_id, h.len,
         |  CASE WHEN e.rn > 1 THEN 'local'
         |       WHEN e.rn = 1 AND cdx.dg IS NOT NULL THEN 'cdx' END AS dedupe_source
         | FROM h LEFT JOIN e ON h.doc_id = e.doc_id LEFT JOIN cdx ON e.dg = cdx.dg)
         |SELECT dedupe_source, count(*) AS n_revisits, CAST(sum(len) AS BIGINT) AS saved_bytes
         |FROM r WHERE dedupe_source IS NOT NULL
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "f08_seen_partitioned" ->
      s"""WITH $fwSql
         |SELECT url_norm, doc_id FROM fw WHERE doc_id % 3 <> 0 ORDER BY url_norm""".stripMargin,

    "f06_host_stats" ->
      s"""WITH p AS ($pSql)
         |SELECT host, count(*) AS n_candidates, count(DISTINCT url_norm) AS n_unique,
         | min(doc_id) AS first_doc
         |FROM p GROUP BY host ORDER BY host""".stripMargin,

    "d01_exact_dedup" ->
      s"""WITH p AS (SELECT doc_id, $text2Duck AS text2 FROM documents),
         |h AS (SELECT doc_id, sha256(text2) AS dg FROM p)
         |SELECT doc_id, row_number() OVER w > 1 AS is_dup,
         | first_value(doc_id) OVER w AS keeper
         |FROM h WINDOW w AS (PARTITION BY dg ORDER BY doc_id) ORDER BY doc_id""".stripMargin,

    "t01_quality" ->
      """SELECT doc_id,
        | CAST(length(text) AS INT) AS n_chars_m,
        | CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INT) AS alpha_chars,
        | CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS INT) AS digit_chars,
        | CAST(length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS INT) AS punct_chars,
        | CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) END AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t02_lang_tokens" ->
      """SELECT lang, count(*) AS docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM (
        | SELECT lang, CASE WHEN length(trim(text)) = 0 THEN 0
        |   ELSE CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) END AS n_tokens
        | FROM documents)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "t03_langid" ->
      """WITH t AS (
        | SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks FROM documents),
        |c AS (
        | SELECT doc_id,
        |  len(list_filter(toks, x -> x IN ('der','die','und','das','ist','nicht','mit','ein','auf','sich'))) AS s_de,
        |  len(list_filter(toks, x -> x IN ('the','and','of','to','in','that','it','is','was','for'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('le','la','et','les','des','est','dans','que','une','pour'))) AS s_fr,
        |  len(list_filter(toks, x -> x IN ('これ','それ','です','ます','した','ない','ある','する','いる','この'))) AS s_ja
        | FROM t)
        |SELECT doc_id,
        | CASE WHEN greatest(s_de, s_en, s_fr, s_ja) = 0 THEN 'und'
        |      WHEN s_ja = greatest(s_de, s_en, s_fr, s_ja) THEN 'ja'
        |      WHEN s_fr = greatest(s_de, s_en, s_fr, s_ja) THEN 'fr'
        |      WHEN s_en = greatest(s_de, s_en, s_fr, s_ja) THEN 'en'
        |      ELSE 'de' END AS lang_pred
        |FROM c ORDER BY doc_id""".stripMargin,

    "m01_media_meta" ->
      """SELECT doc_id, 'png' AS format,
        | CAST(10 + doc_id % 30 AS INT) AS width,
        | CAST(10 + (doc_id * 7) % 20 AS INT) AS height,
        | true AS valid
        |FROM documents ORDER BY doc_id""".stripMargin,

    // fixed expected outputs, encoded as VALUES so the driver enforces the
    // byte-identical parse/extract contracts (not just rows>0)
    "w01_warc_fixture" ->
      """SELECT * FROM (VALUES
        | ('request',  CAST(110 AS BIGINT),   true),
        | ('response', CAST(21830 AS BIGINT), true),
        | ('warcinfo', CAST(143 AS BIGINT),   true))
        |AS t(warc_type, content_length, digest_ok) ORDER BY warc_type""".stripMargin,

    "x01_extract_conformance" ->
      """SELECT CAST(2000 AS BIGINT) AS n_pages, CAST(2000 AS BIGINT) AS n_match,
        | CAST(0 AS BIGINT) AS n_mismatch""".stripMargin,

    "d02_minhash_pairs" ->
      s"""WITH p AS (SELECT doc_id, $text2Duck AS text2 FROM documents),
         |tok AS (
         | SELECT doc_id,
         |  list_filter(regexp_split_to_array(lower(trim(text2)), '\\s+'), x -> len(x) > 0) AS ts
         | FROM p),
         |sh AS (
         | SELECT doc_id,
         |  list_distinct(list_transform(range(1, greatest(len(ts) - 2, 1) + 1),
         |    i -> array_to_string(list_slice(ts, i, i + 2), ' '))) AS ss
         | FROM tok WHERE len(ts) > 0),
         |cand AS (
         | SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         | FROM (SELECT doc_id, unnest(ss) AS s FROM sh) a
         | JOIN (SELECT doc_id, unnest(ss) AS s FROM sh) b
         |   ON a.s = b.s AND a.doc_id < b.doc_id),
         |j AS (
         | SELECT id_a, id_b,
         |  CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE) /
         |  CAST(len(list_distinct(sa.ss || sb.ss)) AS DOUBLE) AS jaccard
         | FROM cand
         | JOIN sh sa ON sa.doc_id = id_a
         | JOIN sh sb ON sb.doc_id = id_b)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.8 ORDER BY id_a, id_b""".stripMargin,

    "t05_stopword_ratio" -> {
      val allStops = graft.operators.TextAnalysis.stopwords.values.flatten.toSeq.sorted
        .map(w => s"'$w'").mkString(",")
      s"""WITH t AS (
         | SELECT doc_id,
         |  list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> len(x) > 0) AS toks
         | FROM documents)
         |SELECT doc_id,
         | CASE WHEN len(toks) = 0 THEN 0.0
         |      ELSE CAST(len(list_filter(toks, x -> x IN ($allStops))) AS DOUBLE)
         |           / CAST(len(toks) AS DOUBLE) END AS stop_ratio
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "s01_ann_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |s AS (
        | SELECT query_id, vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1, len(qv) + 1), i -> CAST(qv[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))
        |  / (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |   * sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        | FROM embeddings, q WHERE vec_id <> query_id)
        |SELECT query_id, neighbor_id, cos, rank FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank FROM s)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  )
}
