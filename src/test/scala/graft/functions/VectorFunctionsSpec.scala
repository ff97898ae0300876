package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def calc(a: Seq[Double], b: Seq[Double]): (Double, Double, Double) =
    Seq((a, b)).toDF("a", "b")
      .select(dot($"a", $"b").as("d"), norm($"a").as("n"), cosine($"a", $"b").as("c"))
      .as[(Double, Double, Double)].collect().head

  test("dot / norm / cosine on known vectors") {
    val (d, n, c) = calc(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))
    assert(d == 32.0)
    assert(math.abs(n - math.sqrt(14.0)) < 1e-15)
    assert(math.abs(c - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-15)
  }

  test("cosine of a vector with itself is 1") {
    val (_, _, c) = calc(Seq(0.3, -0.7, 0.2), Seq(0.3, -0.7, 0.2))
    assert(math.abs(c - 1.0) < 1e-15)
  }

  test("cosine of orthogonal vectors is 0") {
    val (_, _, c) = calc(Seq(1.0, 0.0), Seq(0.0, 1.0))
    assert(c == 0.0)
  }

  test("codegen dot matches the HOF reference implementation bitwise") {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("e"))
    val mism = df.select(
        dot($"e", $"e").as("fast"), dotHof($"e", $"e").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(mism == 0)
  }

  test("unit vectors have norm 1 and preserve cosine as plain dot") {
    val r = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("a", "b")
      .select(
        dot(unit($"a"), unit($"b")).as("c"),
        cosine($"a", $"b").as("ref"))
      .as[(Double, Double)].collect().head
    assert(math.abs(r._1 - 24.0 / 25.0) < 1e-15)
    assert(math.abs(r._1 - r._2) < 1e-15)
  }

  test("unit kernel matches the transform(x / sqrt(dot)) column form bitwise") {
    import org.apache.spark.sql.functions.{col, not, transform => htransform}
    val df = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("e"))
    val ref = htransform($"e", x => x / org.apache.spark.sql.functions.sqrt(dotHof($"e", $"e")))
    val mism = df.select(ref.as("r"), unit($"e").as("f"))
      .filter(not($"r" <=> $"f")).count()
    assert(mism == 0)
  }

  test("dot accumulates left-to-right (deterministic on float-typed input)") {
    // float -> double cast then strict sequential sum: result is exactly
    // reproducible run-to-run (the cross-engine oracle relies on this).
    val r1 = calc(Seq(1e10, 1.0, -1e10), Seq(1.0, 1.0, 1.0))._1
    val r2 = calc(Seq(1e10, 1.0, -1e10), Seq(1.0, 1.0, 1.0))._1
    assert(r1 == r2 && r1 == 1.0)
  }
}
