package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Standard extension entry point: install the engine's Catalyst functions
  * in any session via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * (the same wiring a cluster deployment uses — no code changes needed in
  * the user's job).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("url_normalize", "RFC 3986 syntax-based URL normalization",
      exprs => UrlNormalize(exprs.head)),
    ("url_host", "lowercased host of a URL", exprs => UrlHost(exprs.head)),
    ("url_is_valid", "true when the string is a valid http(s) URL",
      exprs => UrlIsValid(exprs.head)),
    ("sha1_base32", "SHA-1 digest, RFC 4648 base32 (WARC digest encoding)",
      exprs => Sha1Base32(exprs.head)),
    ("sha256_base32", "SHA-256 digest, RFC 4648 base32",
      exprs => Sha256Base32(exprs.head)),
    ("gunzip", "gzip-decompress a BINARY column", exprs => GunzipExpr(exprs.head)),
    ("http_extract_text", "decoded body text of raw HTTP response bytes",
      exprs => HttpExtractText(exprs.head)),
    ("http_parse", "parse raw HTTP response bytes to (status, headers, body)",
      exprs => HttpParse(exprs.head)),
    ("cosine_sim", "cosine similarity of two float arrays (double fold)",
      exprs => CosineSim(exprs(0), exprs(1))),
    ("quantize_i8", "symmetric int8 quantization of a float array (127/max scaling)",
      exprs => QuantizeI8(exprs.head)),
    ("lang_id", "stopword-table language id", exprs => LangIdExpr(exprs.head)),
    ("stopword_ratio", "stopword fraction of whitespace tokens",
      exprs => StopwordRatio(exprs.head)),
    ("doc_fingerprint", "winnowing min-k rolling-hash fingerprint",
      exprs => FingerprintExpr(exprs.head, 8, 4)),
    ("bpe_count", "byte-level BPE token count (committed merge table)",
      exprs => BpeCount(exprs.head)),
    ("bpe_ids", "comma-joined BPE vocab ids (training-shard export form)",
      exprs => BpeIds(exprs.head)),
    ("lm_slog_sum", "sum of scaled log2 char-bigram probabilities (committed LM)",
      exprs => LmSlogSum(exprs.head)))

  override def apply(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, usage, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name, name, usage, ""),
        builder))
    }
}
