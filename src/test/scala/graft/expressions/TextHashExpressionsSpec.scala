package graft.expressions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
import graft.SparkSpec
import graft.functions.TextFunctions._

/** The codegen kernels must be value-identical to the portable column
  * compositions (which is what the DuckDB oracle executes). Checked over
  * the real sf0.001 documents corpus, not toy strings. */
class TextHashExpressionsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("MinhashBandsExpr == shingleHash/minhashInt/bandHashInt composition") {
    val words = tokens(col("text"))
    val h = shingleHash(shingles(words, 3))
    val ref = when(size(words) >= 3,
      array((0 until 4).map(b => bandHashInt(h, b, 2)): _*))
      .otherwise(array().cast("array<long>"))
    val fast = column(MinhashBandsExpr(expression(col("text")), 3, 4))
    val mism = docs.select(ref.as("r"), fast.as("f"))
      .filter(not(col("r") <=> col("f"))).count()
    assert(mism == 0)
  }

  test("DistinctShinglesExpr == array_distinct(shingles(tokens))") {
    val ref = array_distinct(shingles(tokens(col("text")), 3))
    val fast = column(DistinctShinglesExpr(expression(col("text")), 3))
    val mism = docs.select(ref.as("r"), fast.as("f"))
      .filter(not(col("r") <=> col("f"))).count()
    assert(mism == 0)
  }

  test("OrderedShinglesExpr == shingles(tokens) positional column form") {
    val ref = shingles(tokens(col("text")), 5)
    val fast = column(OrderedShinglesExpr(expression(col("text")), 5))
    val mism = docs.select(ref.as("r"), fast.as("f"))
      .filter(not(col("r") <=> col("f"))).count()
    assert(mism == 0)
  }

  test("SimhashBitsExpr == simhashBits column composition") {
    val ref = simhashBits(tokens(col("text")), 16)
    val fast = column(SimhashBitsExpr(expression(col("text")), 16))
    val mism = docs.select(ref.as("r"), fast.as("f"))
      .filter(not(col("r") <=> col("f"))).count()
    assert(mism == 0)
  }

  test("winnowing: shared substrings >= w+k-1 chars share a fingerprint") {
    import spark.implicits._
    val k = 8; val w = 4
    val shared = "the quick brown fox jumps over it" // 33 chars >= k+w-1
    val df = Seq(
      ("A" * 20) + shared + ("B" * 20),
      ("C" * 25) + shared + ("D" * 15),
      "completely unrelated content with nothing in common at all here"
    ).toDF("text")
    val fps = df.select(
      column(WinnowingExpr(expression(col("text")), k, w)).as("f"))
      .collect().map(_.getAs[scala.collection.Seq[Long]]("f").toSet)
    assert((fps(0) intersect fps(1)).nonEmpty, "guarantee violated")
    assert((fps(0) intersect fps(2)).isEmpty)
    // short doc -> empty
    val short = Seq("tiny").toDF("text")
      .select(column(WinnowingExpr(expression(col("text")), k, w)).as("f"))
      .collect().head.getAs[scala.collection.Seq[Long]]("f")
    assert(short.isEmpty)
  }

  test("kernels handle degenerate inputs") {
    import spark.implicits._
    val edge = Seq("", " ", "one", "a b", "a b c").toDF("text")
    val fast = edge.select(
      column(MinhashBandsExpr(expression(col("text")), 3, 4)).as("mb"),
      column(DistinctShinglesExpr(expression(col("text")), 3)).as("ds"),
      column(SimhashBitsExpr(expression(col("text")), 16)).as("sh"))
      .collect()
    // first four rows have <3 words -> empty arrays; simhash always 16 bits
    fast.take(4).foreach { r =>
      assert(r.getSeq[Long](0).isEmpty && r.getSeq[String](1).isEmpty)
    }
    assert(fast.forall(_.getString(2).length == 16))
    assert(fast(4).getSeq[Long](0).length == 4)
    assert(fast(4).getSeq[String](1) == Seq("a b c"))
  }
}
