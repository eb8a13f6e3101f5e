package graft.codec

import scala.collection.mutable

/** Character-bigram language model for CCNet-style quality filtering
  * (Wenzek et al. 2020 filter web text by LM perplexity; a char-bigram
  * model is the dependency-free deterministic analog).
  *
  * Alphabet: 38 symbols — a-z (case-folded) 0-25, digits 26-35, space 36,
  * everything else 37 — so the model is a 1444-row table, small enough to
  * COMMIT as a resource and to replay as a VALUES join in the DuckDB
  * oracle. Add-one smoothing over the alphabet.
  *
  * Scores are EXACT integers: each bigram's log2-probability is stored
  * pre-scaled as `round(log2 P(b|a) · 10^6)` (a LONG), and a document's
  * score is the plain SUM of those integers over its consecutive symbol
  * pairs — order-independent, bitwise reproducible at any partitioning,
  * and summable by DuckDB without float divergence. Mean log2 per bigram
  * = sum / n / 10^6 (one double division at the end, same on both sides).
  */
object Lm {

  final val AlphabetSize = 38
  final val Scale = 1000000L

  /** code point → symbol id (must match the oracle's CASE exactly). */
  def symbol(cp: Int): Int = {
    if (cp >= 'a' && cp <= 'z') cp - 'a'
    else if (cp >= 'A' && cp <= 'Z') cp - 'A'
    else if (cp >= '0' && cp <= '9') 26 + (cp - '0')
    else if (cp == ' ') 36
    else 37
  }

  /** Symbol-id sequence of a text, by code point (BMP + astral safe). */
  def symbols(text: String): Array[Int] = {
    if (text == null || text.isEmpty) return Array.empty
    val out = new mutable.ArrayBuffer[Int](text.length)
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      out += symbol(cp)
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** Train: bigram counts over a corpus → scaled log2 conditionals with
    * add-one smoothing. Returns the full 38×38 table (a, b, slog). */
  def train(corpus: Iterator[String]): Array[Array[Long]] = {
    val counts = Array.ofDim[Long](AlphabetSize, AlphabetSize)
    val totals = new Array[Long](AlphabetSize)
    corpus.foreach { t =>
      val s = symbols(t)
      var i = 0
      while (i < s.length - 1) {
        counts(s(i))(s(i + 1)) += 1
        totals(s(i)) += 1
        i += 1
      }
    }
    val slog = Array.ofDim[Long](AlphabetSize, AlphabetSize)
    var a = 0
    while (a < AlphabetSize) {
      var b = 0
      while (b < AlphabetSize) {
        val p = (counts(a)(b) + 1).toDouble / (totals(a) + AlphabetSize)
        slog(a)(b) = math.round(math.log(p) / math.log(2.0) * Scale)
        b += 1
      }
      a += 1
    }
    slog
  }

  final val ResourcePath = "/graft/lm_bigrams.txt"

  /** Committed model (LmGen regenerates; LmSpec asserts bit-for-bit). */
  lazy val defaultSlog: Array[Array[Long]] = {
    val in = getClass.getResourceAsStream(ResourcePath)
    require(in != null, s"missing resource $ResourcePath — run graft.tools.LmGen")
    val slog = Array.ofDim[Long](AlphabetSize, AlphabetSize)
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).foreach { line =>
      val p = line.split(" ")
      slog(p(0).toInt)(p(1).toInt) = p(2).toLong
    } finally src.close()
    slog
  }

  /** (n_bigrams, Σ slog) of a text under the committed model — both exact
    * integers; the kernel behind `lm_score`. */
  def score(text: String): (Int, Long) = {
    val s = symbols(text)
    if (s.length < 2) return (0, 0L)
    val m = defaultSlog
    var sum = 0L
    var i = 0
    while (i < s.length - 1) {
      sum += m(s(i))(s(i + 1))
      i += 1
    }
    (s.length - 1, sum)
  }

  def render(slog: Array[Array[Long]]): String = {
    val sb = new java.lang.StringBuilder(AlphabetSize * AlphabetSize * 16)
    var a = 0
    while (a < AlphabetSize) {
      var b = 0
      while (b < AlphabetSize) {
        sb.append(a).append(' ').append(b).append(' ').append(slog(a)(b)).append('\n')
        b += 1
      }
      a += 1
    }
    sb.toString
  }

  /** VALUES rows `(a, b, slog)` for the oracle join (1444 rows). */
  def bigramValuesSql: String = {
    val m = defaultSlog
    val sb = new java.lang.StringBuilder(1 << 16)
    var first = true
    var a = 0
    while (a < AlphabetSize) {
      var b = 0
      while (b < AlphabetSize) {
        if (!first) sb.append(',')
        sb.append('(').append(a).append(',').append(b).append(',').append(m(a)(b)).append(')')
        first = false
        b += 1
      }
      a += 1
    }
    sb.toString
  }

  /** DuckDB replay: per-char symbol mapping (same CASE as `symbol`),
    * lead() pairing, VALUES join, integer sum. Output
    * (doc_id, n_bigrams INT, slog_sum BIGINT, mean_log2 DOUBLE). */
  def oracleSql(docsTable: String = "documents", idCol: String = "doc_id",
                textCol: String = "text"): String =
    s"""WITH lm(a, b, slog) AS (VALUES $bigramValuesSql),
       |ch AS (
       |  -- pure code-point arithmetic (no lower(): Unicode case folding
       |  -- can expand characters and would diverge from the kernel)
       |  SELECT $idCol AS doc_id, i,
       |    CASE WHEN ascii(substr($textCol, i, 1)) BETWEEN 97 AND 122
       |           THEN ascii(substr($textCol, i, 1)) - 97
       |         WHEN ascii(substr($textCol, i, 1)) BETWEEN 65 AND 90
       |           THEN ascii(substr($textCol, i, 1)) - 65
       |         WHEN ascii(substr($textCol, i, 1)) BETWEEN 48 AND 57
       |           THEN 26 + ascii(substr($textCol, i, 1)) - 48
       |         WHEN substr($textCol, i, 1) = ' ' THEN 36
       |         ELSE 37 END AS sa
       |  FROM $docsTable, unnest(range(1, length($textCol) + 1)) AS u(i)),
       |pairs AS (
       |  SELECT doc_id, sa, lead(sa) OVER (PARTITION BY doc_id ORDER BY i) AS sb
       |  FROM ch),
       |agg AS (
       |  SELECT p.doc_id, CAST(count(*) AS INT) AS n_bigrams,
       |         CAST(sum(lm.slog) AS BIGINT) AS slog_sum
       |  FROM pairs p JOIN lm ON lm.a = p.sa AND lm.b = p.sb
       |  WHERE p.sb IS NOT NULL
       |  GROUP BY p.doc_id)
       |SELECT d.$idCol AS doc_id,
       |       coalesce(a.n_bigrams, 0) AS n_bigrams,
       |       coalesce(a.slog_sum, 0) AS slog_sum,
       |       CASE WHEN coalesce(a.n_bigrams, 0) = 0 THEN 0.0
       |            ELSE CAST(a.slog_sum AS DOUBLE) / a.n_bigrams / 1000000.0 END AS mean_log2
       |FROM $docsTable d LEFT JOIN agg a ON a.doc_id = d.$idCol
       |ORDER BY doc_id""".stripMargin
}
