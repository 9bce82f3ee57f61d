package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — registers the native vector kernels as
  * permanent SQL functions at session build time:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // programmatic
  * // or spark.sql.extensions=graft.functions.GraftExtensions (config-driven)
  * }}}
  *
  * Unlike `VectorFunctions.register` (temp functions on a live session),
  * injection survives session cloning and applies to every session built
  * from the config — the right mechanism for cluster-wide deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def intArg(e: Expression, fn: String): Int = e match {
    case lit: org.apache.spark.sql.catalyst.expressions.Literal if lit.foldable =>
      lit.eval(null).toString.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      info("cosine_similarity",
        "_FUNC_(a, b) - cosine similarity of two array<double> vectors"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("l2_squared"),
      info("l2_squared",
        "_FUNC_(a, b) - squared L2 distance of two array<double> vectors"),
      (exprs: Seq[Expression]) => L2Squared(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "_FUNC_(a, b) - dot product of two array<double> vectors"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("vector_norm"),
      info("vector_norm", "_FUNC_(a) - Euclidean norm of an array<double> vector"),
      (exprs: Seq[Expression]) => VectorNorm(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "_FUNC_(text, n) - word n-gram shingles of a string"),
      (exprs: Seq[Expression]) =>
        WordShingles(exprs(0), intArg(exprs(1), "word_shingles"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "_FUNC_(shingles, k) - k-value MinHash signature of an array<string>"),
      (exprs: Seq[Expression]) =>
        MinHashSignature(exprs(0), intArg(exprs(1), "minhash_signature"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "_FUNC_(tokens) - 64-bit SimHash of an array<string>"),
      (exprs: Seq[Expression]) => SimHash64(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("canonicalize_text"),
      info("canonicalize_text",
        "_FUNC_(text) - trim + collapse whitespace + lowercase canonical form"),
      (exprs: Seq[Expression]) => CanonicalizeText(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("cdc_boundaries"),
      info("cdc_boundaries",
        "_FUNC_(text) - content-defined chunk boundary positions " +
          "(1-based): 8-term base-31 rolling polynomial, h % 64 == 0"),
      (exprs: Seq[Expression]) => CdcBoundaries(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      info("misra_gries",
        "_FUNC_(term, k) - mergeable k-counter Misra-Gries heavy-hitter " +
          "sketch; returns array<struct<term, lb>> sorted by count desc"),
      (exprs: Seq[Expression]) =>
        MisraGries(exprs(0), intArg(exprs(1), "misra_gries"))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("token_stats"),
      info("token_stats",
        "_FUNC_(text) - struct(n_tokens, sum_len, n_subwords, stop_hits, " +
          "marker_hits) in one fused pass (default stopword/marker lists)"),
      (exprs: Seq[Expression]) => TokenStats(exprs(0),
        graft.operators.TextAnalysis.defaultStopwords,
        graft.operators.TextAnalysis.sortedMarkerSets)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "_FUNC_(a, b) - Jaro-Winkler similarity in [0,1] (boost only when " +
          "jaro > 0.7, prefix cap 4, p = 0.1)"),
      (exprs: Seq[Expression]) => JaroWinkler(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("normalize_nfc"),
      info("normalize_nfc",
        "_FUNC_(text) - Unicode NFC canonical composition (isNormalized " +
          "fast path: ASCII rows pay one scan, zero allocation)"),
      (exprs: Seq[Expression]) => NormalizeNfc(exprs(0))))
    ext.injectFunction((
      FunctionIdentifier("jl_project"),
      info("jl_project",
        "_FUNC_(vec, p) - p-dimensional Johnson-Lindenstrauss sketch of an " +
          "array<double>: 1e-4 fixed-point quantize, md5-derived Rademacher " +
          "signs, exact integer sums"),
      (exprs: Seq[Expression]) =>
        JlProject(exprs(0), intArg(exprs(1), "jl_project"))))
  }
}
