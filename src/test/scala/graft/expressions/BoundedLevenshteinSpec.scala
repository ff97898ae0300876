package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The banded kernel must agree with Spark's built-in levenshtein
  * everywhere within the threshold, and return -1 past it. */
class BoundedLevenshteinKernelSpec extends AnyFunSuite {
  import org.apache.spark.unsafe.types.UTF8String.{fromString => u}

  private def lev(a: String, b: String): Int =
    // reference: classic full DP
    if (a.isEmpty) b.length
    else if (b.isEmpty) a.length
    else {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(a.length)
    }

  test("kernel == full DP when within k; -1 when beyond; randomized") {
    val rnd = new scala.util.Random(7)
    def word(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    (0 until 2000).foreach { _ =>
      val a = word(rnd.nextInt(30))
      val b = if (rnd.nextBoolean()) word(rnd.nextInt(30))
        else {
          val at = rnd.nextInt(a.length + 1)
          a.patch(at, word(rnd.nextInt(4)), math.min(rnd.nextInt(3), a.length - at))
        }
      val k = rnd.nextInt(12)
      val want = lev(a, b)
      val got = TextHashKernels.boundedLevenshtein(u(a), u(b), k)
      if (want <= k) assert(got == want, s"'$a' '$b' k=$k")
      else assert(got == -1, s"'$a' '$b' k=$k want=$want got=$got")
    }
  }

  test("non-BMP: supplementary characters count as ONE edit unit") {
    // 😀 = U+1F600 (2 UTF-16 units, 1 code point). Substituting one emoji
    // for another must cost 1, matching built-in levenshtein / DuckDB
    // (code-point semantics), not 2 (UTF-16-unit semantics).
    assert(TextHashKernels.boundedLevenshtein(u("a😀b"), u("a😁b"), 1) == 1)
    assert(TextHashKernels.boundedLevenshtein(u("😀"), u(""), 1) == 1)
    assert(TextHashKernels.boundedLevenshtein(u("😀"), u("x"), 1) == 1)
    // astral CJK (U+20000): insert one ideograph = 1 edit
    assert(TextHashKernels.boundedLevenshtein(u("ab"), u("a𠀀b"), 1) == 1)
    // and beyond k still bails to -1
    assert(TextHashKernels.boundedLevenshtein(u("😀😁"), u(""), 1) == -1)
  }

  test("non-BMP parity with Spark built-in levenshtein") {
    val cases = Seq(
      ("a😀b", "a😁b"),
      ("𠀀𠀁", "𠀁"),
      ("mix😀ed", "mixed"),
      ("😀", "😀"))
    cases.foreach { case (a, b) =>
      val want = u(a).levenshteinDistance(u(b)) // Spark's own kernel
      val got = TextHashKernels.boundedLevenshtein(u(a), u(b), 10)
      assert(got == want, s"'$a' vs '$b': got $got want $want")
    }
  }

  test("edges: empty strings, k=0, equal strings") {
    assert(TextHashKernels.boundedLevenshtein(u(""), u(""), 0) == 0)
    assert(TextHashKernels.boundedLevenshtein(u("abc"), u(""), 3) == 3)
    assert(TextHashKernels.boundedLevenshtein(u("abc"), u(""), 2) == -1)
    assert(TextHashKernels.boundedLevenshtein(u("same"), u("same"), 0) == 0)
    assert(TextHashKernels.boundedLevenshtein(u("a"), u("b"), 0) == -1)
  }
}

/** Column-level parity with the built-in over the real corpus. */
class BoundedLevenshteinColumnSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

  test("kernel matches levenshtein() on near-dup document pairs (codegen on)") {
    val doc = graft.Tables.documents(spark, sf001).select($"doc_id", $"text")
    val pairs = doc.select($"text".as("a"),
      regexp_replace($"text", "^[^ ]+ ", "").as("b"))
    val k = 60
    val got = pairs.select(
        column(BoundedLevenshteinExpr(expression($"a"), expression($"b"), k))
          .as("kd"),
        levenshtein($"a", $"b").as("full"))
      .collect()
    got.foreach { r =>
      val (kd, full) = (r.getInt(0), r.getInt(1))
      if (full <= k) assert(kd == full) else assert(kd == -1)
    }
    assert(got.nonEmpty && got.exists(_.getInt(0) > 0))
  }
}
