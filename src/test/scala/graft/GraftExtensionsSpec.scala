package graft

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions run the codegen kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_product(array(1D, 2D, 3D), array(4D, 5D, 6D)) AS d,
        |       normalize_vector(array(3D, 4D)) AS u,
        |       minhash_bands('a b c d e', 3, 4) AS mb,
        |       distinct_shingles('a b c d', 3) AS ds,
        |       simhash_bits('hello world', 16) AS sh,
        |       ngram_rep_stats('x y x y x y', 2) AS nr
        |""".stripMargin).collect().head
    assert(r.getAs[Double]("d") == 32.0)
    assert(r.getAs[scala.collection.Seq[Double]]("u") == Seq(0.6, 0.8))
    assert(r.getAs[scala.collection.Seq[Long]]("mb").length == 4)
    assert(r.getAs[scala.collection.Seq[String]]("ds") == Seq("a b c", "b c d"))
    assert(r.getAs[String]("sh").length == 16)
    // 5 bigrams: 'x y' ×3, 'y x' ×2 → top 3, dup 5-2=3
    assert(r.getAs[scala.collection.Seq[Long]]("nr") == Seq(5L, 3L, 3L))
  }

  test("round-9 registrations: edit distance, histogram, shingles, spans, BPE") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT bounded_levenshtein('kitten', 'sitting', 3) AS lev,
        |       bounded_levenshtein('abc', 'xyz12345', 2) AS levnull,
        |       char_hist27('ab ba') AS hist,
        |       ordered_shingles('a b a b', 2) AS os,
        |       cut_spans('a b c d e f', array(1), 2) AS cut,
        |       bpe_segment('low lower', array('{l}{o}', '{lo}{w}')) AS bpe
        |""".stripMargin).collect().head
    assert(r.getAs[Int]("lev") == 3)
    assert(r.getAs[Int]("levnull") == -1) // length gap 5 > k=2 -> sentinel
    val hist = r.getAs[scala.collection.Seq[Long]]("hist")
    assert(hist.length == 27 && hist(0) == 2L && hist(1) == 2L && hist(26) == 1L)
    // ordered (not distinct): both 'a b' occurrences survive in order
    assert(r.getAs[scala.collection.Seq[String]]("os") == Seq("a b", "b a", "a b"))
    // cut start 1, span 2 tokens: 'b c' removed
    assert(r.getAs[String]("cut") == "a d e f")
    assert(r.getAs[scala.collection.Seq[String]]("bpe") == Seq("low", " ", "low", "e", "r"))
    // the merge table must be a literal array — a column is rejected
    val e = intercept[Exception] {
      spark.sql("SELECT bpe_segment('x', array(cast(rand() as string)))").collect()
    }
    def walk(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: walk(t.getCause)
    assert(walk(e).exists(t =>
      Option(t.getMessage).exists(_.contains("literal array<string>"))))
    // ... and so is a null ELEMENT (would NPE mid-extraction otherwise)
    val en = intercept[Exception] {
      spark.sql("SELECT bpe_segment('x', array('{l}{o}', cast(NULL as string)))")
        .collect()
    }
    assert(walk(en).exists(t =>
      Option(t.getMessage).exists(_.contains("no null elements"))))
  }

  test("hash_bucket SQL function matches the Sampling column form") {
    GraftExtensions.register(spark)
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 100L).toDF("k")
    val sqlSide = df.selectExpr("k", "hash_bucket(k, 'seed') AS b")
      .as[(Long, Long)].collect().toMap
    val colSide = df.select(col("k"),
        graft.operators.Sampling.hashBucket(col("k"), "seed").as("b"))
      .as[(Long, Long)].collect().toMap
    assert(sqlSide == colSide)
    assert(sqlSide.values.forall(b => b >= 0 && b < 1000000L))
  }

  test("non-literal shape args are rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_bands('x', 1 + 2, 4)").collect()
    }
    assert(e.getMessage.contains("literal int") || e.getCause != null)
  }

  test("wrong arity raises the usage string, never IndexOutOfBounds") {
    GraftExtensions.register(spark)
    for ((sql, usageBit) <- Seq(
        ("SELECT ngram_rep_stats('x')", "ngram_rep_stats(text, n)"),
        ("SELECT dot_product(array(1.0))", "dot_product(a, b)"),
        ("SELECT simhash64('a', 'b')", "simhash64(text)"),
        ("SELECT minhash_bands('x', 3)", "minhash_bands(text, shingleN, numBands)"))) {
      val e = intercept[Exception] { spark.sql(sql).collect() }
      def walk(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: walk(t.getCause)
      val chain = walk(e)
      assert(!chain.exists(_.isInstanceOf[IndexOutOfBoundsException]),
        s"$sql surfaced IndexOutOfBounds")
      assert(chain.exists(t => Option(t.getMessage).exists(_.contains(usageBit))),
        s"$sql error lacks usage string: ${e.getMessage}")
    }
  }
}
