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
  * This is the SURVEY.md §2.9 extension path — no custom optimizer rules
  * or strategies are needed for the reference's semantics (SURVEY.md §4),
  * so the extension surface is exactly the function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import GraftExtensions.intArg

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - double dot product of two array<double>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("normalize_vector"),
      info("normalize_vector", "normalize_vector(a) - unit-normalized array<double>"),
      (args: Seq[Expression]) => NormalizeVector(args.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      info("minhash_bands",
        "minhash_bands(text, shingleN, numBands) - banded minhash signature"),
      (args: Seq[Expression]) => MinhashBandsExpr(args.head,
        intArg(args(1), "shingleN"), intArg(args(2), "numBands"))))
    ext.injectFunction((
      FunctionIdentifier("distinct_shingles"),
      info("distinct_shingles", "distinct_shingles(text, n) - distinct word n-grams"),
      (args: Seq[Expression]) => DistinctShinglesExpr(args.head, intArg(args(1), "n"))))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      info("simhash_bits", "simhash_bits(text, bits) - '0'/'1' simhash string"),
      (args: Seq[Expression]) => SimhashBitsExpr(args.head, intArg(args(1), "bits"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit simhash fingerprint"),
      (args: Seq[Expression]) => Simhash64Expr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints",
        "winnow_fingerprints(text, k, w) - winnowing document fingerprints"),
      (args: Seq[Expression]) => WinnowingExpr(args.head,
        intArg(args(1), "k"), intArg(args(2), "w"))))
    ext.injectFunction((
      FunctionIdentifier("hash_bucket"),
      info("hash_bucket",
        "hash_bucket(key, seed) - deterministic sampling bucket in [0, 1e6)"),
      (args: Seq[Expression]) => GraftExtensions.hashBucketExpr(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("ngram_rep_stats"),
      info("ngram_rep_stats",
        "ngram_rep_stats(text, n) - [n_grams, top_cnt, dup_cnt] repetition stats"),
      (args: Seq[Expression]) => NgramRepExpr(args.head, intArg(args(1), "n"))))
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

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def add(name: String, usage: String)(b: Seq[Expression] => Expression): Unit =
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, null, name, usage,
          "", "", "", "", "", "", "built-in"), b)
    add("dot_product", "dot product")(a => DotProduct(a(0), a(1)))
    add("normalize_vector", "unit normalize")(a => NormalizeVector(a.head))
    add("minhash_bands", "banded minhash")(a =>
      MinhashBandsExpr(a.head, intArg(a(1), "shingleN"), intArg(a(2), "numBands")))
    add("distinct_shingles", "distinct shingles")(a =>
      DistinctShinglesExpr(a.head, intArg(a(1), "n")))
    add("simhash_bits", "simhash bits")(a =>
      SimhashBitsExpr(a.head, intArg(a(1), "bits")))
    add("simhash64", "64-bit simhash")(a => Simhash64Expr(a.head))
    add("winnow_fingerprints", "winnowing fingerprints")(a =>
      WinnowingExpr(a.head, intArg(a(1), "k"), intArg(a(2), "w")))
    add("hash_bucket", "deterministic sampling bucket")(a =>
      hashBucketExpr(a(0), a(1)))
    add("ngram_rep_stats", "n-gram repetition stats")(a =>
      NgramRepExpr(a.head, intArg(a(1), "n")))
  }
}
