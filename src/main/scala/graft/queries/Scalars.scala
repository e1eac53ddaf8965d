package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.scalars.Genomics

/** Scalar-function inventory (SURVEY.md §2.7) exercised over the star
  * schema's string/date columns. All pure built-in compositions — the whole
  * projection stays in one WholeStageCodegen span over the parquet scan. */
object Scalars {

  /** rev_comp + name normalization + composite index over part strings. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).part.select(
      col("p_partkey"),
      Genomics.revComp(col("p_name")).as("rc"),
      Genomics.normalizeName(col("p_name")).as("norm"),
      Genomics.compositeIndex(col("p_brand"), col("p_type")).as("composite"),
      Genomics.stripN(upper(col("p_name"))).as("no_n"),
      Genomics.cleanProject(col("p_type")).as("clean"))

  /** Date/time functions over order dates (seqrun-date parse, cutoff-week
    * delta, duration idioms — SURVEY §2.7). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders.select(
      col("o_orderkey"),
      unix_timestamp(col("o_orderdate")).as("ep"),
      year(col("o_orderdate")).as("y"),
      month(col("o_orderdate")).as("m"),
      unix_timestamp(date_trunc("month", col("o_orderdate"))).as("month_ep"),
      datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
        .as("days_to_cutoff"))

  /** Regex predicates: rlike classification census (10X index detection /
    * G-homopolymer / email-shape idioms as CASE buckets). */
  def regexClassify(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).part.select(
      col("p_partkey"),
      col("p_name").rlike("^[a-z]+ [a-z]+$").as("two_words"),
      col("p_brand").rlike("^Brand#[0-9]+$").as("brand_shape"),
      Genomics.isGHomopolymer(upper(col("p_name"))).as("g_homopolymer"))

  /** PII redaction ([[graft.text.Redaction]]): the synthetic corpus carries
    * no real PII, so the query CONSTRUCTS a PII-bearing string from customer
    * fields deterministically (same construction in the oracle) and then
    * redacts it — the patterns and their application order are what's under
    * test. Pure scalar projection, shuffle-free. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    import graft.text.Redaction
    val txt = concat(
      col("c_name"), lit(" <"), lower(col("c_name")), lit("@example.com> from 192.168."),
      pmod(col("c_custkey"), lit(256)), lit(".1 call 555-123-"),
      lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
      lit(" or visit https://ex.com/u/"), col("c_custkey"))
    // spread: a deliberate exception to the pure-projection-never-
    // shuffles rule — the redaction regex chains are ~10x the cost of
    // shuffling the two narrow input columns, and the single-task scan
    // would run them serially (0.90 -> 0.22 s at sf0.1). On a many-file
    // input whose scan already parallelizes, drop the spread.
    Tables.spread(Tables(s, dir).customer.select("c_custkey", "c_name"), "c_custkey")
      .select(
      col("c_custkey"),
      Redaction.redact(txt).as("clean"),
      Redaction.countMatches(txt, "email").as("n_email"),
      Redaction.countMatches(txt, "ipv4").as("n_ip"),
      Redaction.totalHits(txt).as("n_pii"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_string_funcs"   -> (stringFuncs _),
    "q19_date_funcs"     -> (dateFuncs _),
    "q22_regex_classify" -> (regexClassify _),
    "q54_pii_redact"     -> (piiRedact _))

  /** q54's patterns, quoted for a DuckDB string literal (the URL class
    * contains a single quote) — generated from [[graft.text.Redaction]]
    * so query and oracle share one pattern table. */
  private def pat(name: String): String =
    graft.text.Redaction.patterns
      .collectFirst { case (`name`, p, _) => p.replace("'", "''") }
      .getOrElse(sys.error(s"unknown pattern $name"))

  private val piiOracle: String =
    s"""WITH t AS (
       |  SELECT c_custkey,
       |         c_name || ' <' || lower(c_name) || '@example.com> from 192.168.'
       |           || CAST(c_custkey % 256 AS VARCHAR) || '.1 call 555-123-'
       |           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
       |           || ' or visit https://ex.com/u/' || CAST(c_custkey AS VARCHAR) AS txt
       |  FROM customer),
       |-- totalHits counts each pattern on the text AFTER the previous
       |-- replacements, exactly like Redaction.totalHits's fold
       |c AS (
       |  SELECT c_custkey, txt,
       |         regexp_replace(txt, '${pat("url")}', '[URL]', 'g') AS s1
       |  FROM t),
       |c2 AS (SELECT *, regexp_replace(s1, '${pat("email")}', '[EMAIL]', 'g') AS s2 FROM c),
       |c3 AS (SELECT *, regexp_replace(s2, '${pat("phone")}', '[PHONE]', 'g') AS s3 FROM c2)
       |SELECT c_custkey,
       |       regexp_replace(s3, '${pat("ipv4")}', '[IP]', 'g') AS clean,
       |       CAST(len(regexp_extract_all(txt, '${pat("email")}')) AS INT) AS n_email,
       |       CAST(len(regexp_extract_all(txt, '${pat("ipv4")}')) AS INT) AS n_ip,
       |       CAST(len(regexp_extract_all(txt, '${pat("url")}'))
       |          + len(regexp_extract_all(s1, '${pat("email")}'))
       |          + len(regexp_extract_all(s2, '${pat("phone")}'))
       |          + len(regexp_extract_all(s3, '${pat("ipv4")}')) AS INT) AS n_pii
       |FROM c3""".stripMargin

  val oracles: Map[String, String] = Map(
    "q54_pii_redact" -> piiOracle,
    "q18_string_funcs" ->
      """SELECT p_partkey,
        |       reverse(translate(upper(p_name), 'ACGT', 'TGCA')) AS rc,
        |       regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |         p_name, '\s+', '-', 'g'), '[^a-zA-Z0-9_-]', '-', 'g'),
        |         '-+', '-', 'g'), '^-|-$', '', 'g') AS norm,
        |       CASE WHEN p_type IS NULL OR p_type = '' THEN p_brand
        |            ELSE concat_ws('+', p_brand, p_type) END AS composite,
        |       translate(upper(p_name), 'Nn', '') AS no_n,
        |       split_part(p_type, ':', 1) AS clean
        |FROM part""".stripMargin,
    "q19_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS ep,
        |       CAST(year(o_orderdate) AS INT) AS y,
        |       CAST(month(o_orderdate) AS INT) AS m,
        |       CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_ep,
        |       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_cutoff
        |FROM orders""".stripMargin,
    "q22_regex_classify" ->
      """SELECT p_partkey,
        |       regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS two_words,
        |       regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_shape,
        |       regexp_matches(upper(p_name), '^G+$') AS g_homopolymer
        |FROM part""".stripMargin)
}
