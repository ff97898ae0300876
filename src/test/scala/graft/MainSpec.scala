package graft

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** CLI smoke: help, arg validation, and a full fixture-dir build through
  * Main.run (the same artifacts BuildGraphSpec checks piecewise). */
class MainSpec extends SparkSpec {

  test("--help exits 0, bad args exit 2") {
    assert(Main.run(Seq("--help"), Some(spark)) == 0)
    assert(Main.run(Seq("--bogus"), Some(spark)) == 2)
    assert(Main.run(Seq("--data-dir", "x"), Some(spark)) == 2) // out-dir missing
  }

  test("fixture build via --use-cache writes the release artifacts") {
    val outDir = Files.createTempDirectory("graft-main").toString
    val code = Main.run(Seq(
      "--data-dir", "src/test/resources/omim",
      "--out-dir", outDir,
      "--use-cache",
      "--version-date", "2026-08-12"), Some(spark))
    assert(code == 0)
    // sinks write Spark text directories (coalesced to one part file)
    // match only the data file — Files.list order is unspecified and the
    // binary .part-*.crc checksum would fail the UTF-8 read
    val ttlPart = Files.list(Paths.get(outDir, "omim.ttl")).toArray
      .map(_.toString)
      .filter(p => p.contains("part-") && !p.endsWith(".crc") &&
        !Paths.get(p).getFileName.toString.startsWith("."))
    assert(ttlPart.nonEmpty, "omim.ttl part file missing")
    val head = Files.readAllLines(Paths.get(ttlPart.head))
    assert(head.size > 100, s"omim.ttl suspiciously small: ${head.size} lines")
    assert(head.get(0).startsWith("@prefix"), "Turtle must start with prefixes")
    Seq("review.tsv", "mondo-omim-genes.robot.tsv",
        "disease-gene-relationships-qc.tsv", "omim.sssom.tsv",
        "morbidmap-protected-added.tsv").foreach { f =>
      assert(Files.exists(Paths.get(outDir, f)), s"$f missing")
    }
  }

  test("no-cache path without OMIM_API_KEY fails fast with a clear error") {
    assume(!sys.env.contains("OMIM_API_KEY"))
    val outDir = Files.createTempDirectory("graft-main2").toString
    val code = Main.run(Seq(
      "--data-dir", "src/test/resources/omim",
      "--out-dir", outDir), Some(spark))
    assert(code == 2)
  }
}
