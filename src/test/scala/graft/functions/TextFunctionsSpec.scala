package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).collect().head.getAs[T]("r")

  private def arr(c: org.apache.spark.sql.Column, text: String): List[String] =
    one[scala.collection.Seq[String]](c, text).toList

  test("tokens drops empty strings from repeated spaces") {
    assert(arr(tokens($"t"), "a  b   c") == List("a", "b", "c"))
  }

  test("shingles produces n-grams in order") {
    assert(arr(shingles(tokens($"t"), 3), "a b c d") == List("a b c", "b c d"))
  }

  test("shingles is empty when doc shorter than n") {
    assert(arr(shingles(tokens($"t"), 3), "a b") == Nil)
  }

  test("fingerprint collapses whitespace and case") {
    val a = one[String](fingerprint($"t"), "Hello   World")
    val b = one[String](fingerprint($"t"), "hello world")
    assert(a == b && a.length == 32)
  }

  test("fingerprint differs on different text") {
    assert(one[String](fingerprint($"t"), "abc") != one[String](fingerprint($"t"), "abd"))
  }

  test("bpeTokenCount splits letter runs, digit runs, symbols") {
    // "ab12-cd" -> [ab][12][-][cd]; "x y" -> [x][y]
    assert(one[Int](bpeTokenCount($"t"), "ab12-cd") == 4)
    assert(one[Int](bpeTokenCount($"t"), "x y") == 2)
  }

  test("minhashHex is the min over salted shingle hashes and seed-sensitive") {
    val m0 = one[String](minhashHex(shingles(tokens($"t"), 2), 0), "a b c")
    val m1 = one[String](minhashHex(shingles(tokens($"t"), 2), 1), "a b c")
    assert(m0.length == 32 && m0 != m1)
  }

  test("bandHash equal iff all band rows equal") {
    val h1 = one[String](bandHash(shingles(tokens($"t"), 2), 0, 2), "a b c d")
    val h2 = one[String](bandHash(shingles(tokens($"t"), 2), 0, 2), "a b c d")
    val h3 = one[String](bandHash(shingles(tokens($"t"), 2), 1, 2), "a b c d")
    assert(h1 == h2 && h1 != h3)
  }

  test("simhashBits: identical texts agree, near-dups are close, length is bits") {
    val s1 = one[String](simhashBits(tokens($"t"), 16), "the quick brown fox jumps over the lazy dog")
    val s2 = one[String](simhashBits(tokens($"t"), 16), "the quick brown fox jumps over the lazy dog")
    val s3 = one[String](simhashBits(tokens($"t"), 16), "quick brown fox jumps over the lazy dog")
    assert(s1.length == 16 && s1 == s2)
    val hamming = s1.zip(s3).count { case (a, b) => a != b }
    assert(hamming <= 6, s"near-dup hamming too large: $hamming")
  }

  test("markerHits counts membership") {
    val c = markerHits(tokens($"t"), Seq("the", "and"))
    assert(one[Int](c, "the cat and the dog") == 3)
  }

  test("gpt2PreTokens: contractions, digit/letter boundaries, punct runs, attached spaces") {
    val toks = one[scala.collection.Seq[String]](gpt2PreTokens($"t"),
      "Hello, world's  42nd test-case!")
    assert(toks == Seq("Hello", ",", " world", "'s", "42", "nd", " test", "-", "case", "!"))
    assert(one[scala.collection.Seq[String]](gpt2PreTokens($"t"), "   ") == Seq())
    // the count a token-budget gate would use: 'we'll' is 2, '3.14' is 3
    assert(one[scala.collection.Seq[String]](gpt2PreTokens($"t"), "we'll run 3.14")
      == Seq("we", "'ll", " run", " 3", ".", "14"))
  }
}
