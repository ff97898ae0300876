package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Triple

/** Sinks for the OMIM artifact family (SURVEY.md §2.1 S9/S10). */
object Sinks {

  /** Default CURIE prefix expansions for the Turtle sink: the
    * reference's full dipper curie_map.yaml (212 bindings) plus the
    * namespaces.py extras — see [[CurieMap]] (S6). */
  def defaultPrefixes: Map[String, String] = CurieMap.default

  /** Distinct CURIE prefixes appearing in the triple set: subject,
    * predicate, and non-literal object terms that are neither
    * `<>`-wrapped IRIs nor `_:` bnodes. One tiny distinct aggregate
    * (bounded by the number of namespaces, ≤ a few hundred rows) —
    * the only driver-side collect in the sink, and it is metadata. */
  def usedPrefixes(triples: Dataset[Triple]): Set[String] = {
    val df = triples.toDF()
    val terms = df.select(col("s").as("t"))
      .unionAll(df.select(col("p").as("t")))
      .unionAll(df.filter(!col("oIsLiteral")).select(col("o").as("t")))
    // Every non-IRI non-bnode term must be a CURIE (have a ':'): a term
    // without one can never expand, so fail loudly instead of silently
    // skipping it. The prefix is everything before the FIRST colon —
    // including the dipper map's '' base prefix and any digit-leading
    // prefix — so unusual prefixes hit the unbound-prefix require()
    // in writeTurtle rather than bypassing it.
    val rows = terms
      .filter(!col("t").startsWith("<") && !col("t").startsWith("_:"))
      .select(when(col("t").contains(":"),
        substring_index(col("t"), ":", 1)).as("pfx"))
      .distinct()
      .collect()
    require(rows.forall(!_.isNullAt(0)),
      "non-literal term is neither <IRI>, _:bnode, nor prefix:CURIE")
    rows.map(_.getString(0)).toSet
  }

  /** One canonical N-Triples-style line per edge row. Literals are escaped
    * and quoted; bnode ids (`_:`) and already-`<>`-wrapped IRIs pass
    * through; CURIEs stay compact (Turtle prefix form). Output equivalence
    * with the reference is defined as TRIPLE-SET equality (SURVEY.md §7.4),
    * which sorted canonical lines give us. */
  def toTurtleLines(triples: Dataset[Triple]): DataFrame = {
    val esc = (c: org.apache.spark.sql.Column) =>
      regexp_replace(regexp_replace(regexp_replace(c,
        "\\\\", "\\\\\\\\"), "\"", "\\\\\""), "\n", "\\\\n")
    val term = (c: org.apache.spark.sql.Column, isLit: org.apache.spark.sql.Column) =>
      when(isLit, concat(lit("\""), esc(c), lit("\"")))
        .otherwise(c)
    triples.toDF().select(
      concat(
        col("s"), lit(" "), col("p"), lit(" "),
        term(col("o"), col("oIsLiteral")), lit(" .")).as("line"))
  }

  /** Write the graph as Turtle: @prefix header + sorted triple lines.
    *
    * Like rdflib's Turtle serializer (which the reference relies on,
    * main.py:236-238), the header binds exactly the prefixes the
    * triple set USES, resolved against `prefixes` (default = the full
    * 200+-entry dipper map). A used prefix with no binding is an
    * error: the emitted CURIE would be un-expandable for every
    * downstream consumer, so fail loudly at write time instead.
    *
    * `singleFile=true` coalesces to one part (fine ≤10^7 triples; leave
    * false at scale — SURVEY.md §7.4). */
  def writeTurtle(spark: SparkSession, triples: Dataset[Triple], path: String,
                  prefixes: Map[String, String] = defaultPrefixes,
                  singleFile: Boolean = true): Unit = {
    import spark.implicits._
    val used = usedPrefixes(triples)
    val unbound = used -- prefixes.keySet
    require(unbound.isEmpty,
      s"triples use CURIE prefixes with no binding: ${unbound.toSeq.sorted.mkString(", ")}")
    // Explicit (section, line) sort key: a plain union's branch order is NOT
    // preserved through coalesce, so the header gets section 0.
    val header = prefixes.filter(kv => used.contains(kv._1)).toSeq.sorted
      .map { case (p, u) => (0, s"@prefix $p: <$u> .") }.toDF("sec", "line")
    val body = toTurtleLines(triples).select(lit(1).as("sec"), col("line"))
    val out = header.unionByName(body).orderBy("sec", "line").select("line")
    (if (singleFile) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }

  /** Ordered TSV sink with optional extra header rows (ROBOT templates
    * prepend a sub-header row — ref: mondo_omim_genes_robot_tsv.py:19-41,
    * main.py:512-519). Sort before write = W3; single file for artifact
    * parity, plain distributed write for scale. */
  def writeOrderedTsv(df: DataFrame, path: String, sortCols: Seq[String],
                      extraHeaderRows: Seq[Seq[String]] = Nil,
                      preHeaderLines: Seq[String] = Nil,
                      singleFile: Boolean = true): Unit = {
    val spark = df.sparkSession
    val cols = df.columns
    import spark.implicits._
    // One distributed range sort over (__sec, __idx, sortCols...): header
    // rows carry sec 0 + their declared index (sortCols null there); body
    // rows carry sec 1 and sort by the requested columns. No global
    // row_number window (which would funnel everything through one task).
    // preHeaderLines land before the column header (SSSOM front-matter).
    var header = (preHeaderLines ++ (cols.toSeq +: extraHeaderRows).map(_.mkString("\t")))
      .zipWithIndex
      .map { case (line, i) => (0, i.toLong, line) }
      .toDF("__sec", "__idx", "__line")
    sortCols.foreach { sc =>
      header = header.withColumn(sc, lit(null).cast(df.schema(sc).dataType))
    }
    val body = df
      .select((Seq(lit(1).as("__sec"), lit(0L).as("__idx"),
        concat_ws("\t",
          cols.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
          .as("__line")) ++ sortCols.map(col)): _*)
    val out = header.unionByName(body)
      .orderBy((Seq(col("__sec"), col("__idx")) ++ sortCols.map(col)): _*)
      .select("__line")
    (if (singleFile) out.coalesce(1) else out).write.mode("overwrite").text(path)
  }
}
