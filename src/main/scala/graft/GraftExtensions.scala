package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Conv, Expression, ExpressionInfo, Literal, Md5, Pmod, Substring}
import org.apache.spark.sql.types.{LongType, StringType}

import graft.expressions._

/** SparkSessionExtensions entry point: registers the graft codegen
  * expressions as SQL functions, so `spark.sql` users get the same
  * kernels as the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)       // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * // then:
  * spark.sql("SELECT dot_product(a, b), normalize_vector(a) FROM t")
  * spark.sql("SELECT minhash_bands(text, 3, 4) FROM docs")
  * }}}
  *
  * This is the SURVEY.md §2.9 extension path: the function registry for
  * the codegen kernels, plus one genuinely beneficial optimizer rule —
  * [[graft.plans.EditDistancePrefilter]] injects the length lower-bound
  * guard in front of bounded levenshtein predicates (the reference's own
  * semantics need no custom rules, SURVEY.md §4; this one serves the
  * fuzzy-dedup north star).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.intArg

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, arity, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name, usage),
        GraftExtensions.checkedBuilder(name, usage, arity)(builder)))
    }
    ext.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
  }
}

/** Registration for an EXISTING session (tests, REPLs): the extensions
  * mechanism only applies at session build time, so this installs the
  * same functions into a live session's registry. */
object GraftExtensions {

  private[graft] def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  /** The [[graft.operators.Sampling.hashBucket]] column as a raw
    * expression tree (analyzer inserts the string→binary cast for md5):
    * pmod(conv(substr(md5(seed || cast(key as string)), 1, 15), 16, 10)
    * :: long, 1e6). */
  private[graft] def hashBucketExpr(key: Expression, seed: Expression): Expression =
    Pmod(
      Cast(Conv(
        Substring(Md5(Cast(Concat(Seq(seed, Cast(key, StringType))),
          org.apache.spark.sql.types.BinaryType)),
          Literal(1), Literal(15)),
        Literal(16), Literal(10)), LongType),
      Literal(graft.operators.Sampling.Buckets))

  /** One registration table for both paths (extension install and live
    * session): (name, usage, arity, builder). */
  private[graft] val functions: Seq[(String, String, Int, Seq[Expression] => Expression)] = Seq(
    ("dot_product", "dot_product(a, b) - double dot product of two array<double>",
      2, a => DotProduct(a(0), a(1))),
    ("normalize_vector", "normalize_vector(a) - unit-normalized array<double>",
      1, a => NormalizeVector(a.head)),
    ("minhash_bands", "minhash_bands(text, shingleN, numBands) - banded minhash signature",
      3, a => MinhashBandsExpr(a.head, intArg(a(1), "shingleN"), intArg(a(2), "numBands"))),
    ("distinct_shingles", "distinct_shingles(text, n) - distinct word n-grams",
      2, a => DistinctShinglesExpr(a.head, intArg(a(1), "n"))),
    ("simhash_bits", "simhash_bits(text, bits) - '0'/'1' simhash string",
      2, a => SimhashBitsExpr(a.head, intArg(a(1), "bits"))),
    ("simhash64", "simhash64(text) - 64-bit simhash fingerprint",
      1, a => Simhash64Expr(a.head)),
    ("winnow_fingerprints", "winnow_fingerprints(text, k, w) - winnowing document fingerprints",
      3, a => WinnowingExpr(a.head, intArg(a(1), "k"), intArg(a(2), "w"))),
    ("hash_bucket", "hash_bucket(key, seed) - deterministic sampling bucket in [0, 1e6)",
      2, a => hashBucketExpr(a(0), a(1))),
    ("ngram_rep_stats", "ngram_rep_stats(text, n) - [n_grams, top_cnt, dup_cnt] repetition stats",
      2, a => NgramRepExpr(a.head, intArg(a(1), "n"))),
    ("to_roman", "to_roman(n) - roman numeral of an int in 1..4999",
      1, a => ToRomanExpr(a.head)),
    ("from_roman", "from_roman(s) - greedy front-parse of a roman numeral",
      1, a => FromRomanExpr(a.head)),
    ("cleanup_title", "cleanup_title(s) - OMIM C1 title cleanup pipeline",
      1, a => CleanupTitleExpr(a.head)),
    ("nfc_normalize", "nfc_normalize(s) - UAX #15 canonical composition",
      1, a => NfcNormalizeExpr(a.head)),
    ("nfkc_normalize", "nfkc_normalize(s) - UAX #15 compatibility composition",
      1, a => NfkcNormalizeExpr(a.head)),
    ("bounded_levenshtein", "bounded_levenshtein(a, b, k) - banded edit distance, -1 past k",
      3, a => BoundedLevenshteinExpr(a(0), a(1), intArg(a(2), "k"))),
    ("char_hist27", "char_hist27(s) - 27-bin a..z/other char histogram",
      1, a => CharHist27Expr(a.head)),
    ("ordered_shingles", "ordered_shingles(s, n) - word n-grams in document order",
      2, a => OrderedShinglesExpr(a.head, intArg(a(1), "n"))),
    ("cut_spans", "cut_spans(text, spans, spanTokens) - remove flagged token spans",
      3, a => CutSpansExpr(a(0), a(1), intArg(a(2), "spanTokens"))),
    ("bpe_segment", "bpe_segment(text, merges) - BPE subwords under a literal merge table",
      2, a => BpeSegmentExpr(a(0), stringArrayArg(a(1), "merges"))))

  /** Extract a foldable array<string> argument (the BPE merge table —
    * bounded driver metadata, same contract as the Scala API). */
  private[graft] def stringArrayArg(e: Expression, name: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType => SqlString}
    if (!e.foldable || !e.dataType.isInstanceOf[ArrayType] ||
        e.dataType.asInstanceOf[ArrayType].elementType != SqlString)
      throw new IllegalArgumentException(
        s"$name expects a literal array<string> argument, got $e")
    e.eval() match {
      case a: ArrayData =>
        a.toObjectArray(SqlString).toSeq.map {
          case null => throw new IllegalArgumentException(
            s"$name expects a literal array<string> with no null elements")
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
        }
      case other => throw new IllegalArgumentException(
        s"$name expects a literal array<string>, evaluated to $other")
    }
  }

  /** Wrap a builder with an arity check: a wrong argument count raises a
    * clear error carrying the usage string instead of surfacing an
    * IndexOutOfBoundsException from a blind args(i). */
  private[graft] def checkedBuilder(name: String, usage: String, arity: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.length == arity) b(args)
      else throw new IllegalArgumentException(
        s"$name expects $arity argument(s) but got ${args.length}; usage: $usage")

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, usage, arity, builder) =>
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, null, name, usage,
          "", "", "", "", "", "", "built-in"),
        checkedBuilder(name, usage, arity)(builder))
    }
    // extraOptimizations is the live-session twin of injectOptimizerRule
    if (!spark.experimental.extraOptimizations.contains(
        graft.plans.EditDistancePrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.EditDistancePrefilter
  }
}
