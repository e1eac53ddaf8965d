package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrubbing pass a training-data
  * pipeline runs before anything else sees the text (emails, phone
  * numbers, IP addresses, URLs → typed placeholder tokens).
  *
  * Patterns are deliberately restricted to the regex subset that Java's
  * engine (Spark) and RE2 (DuckDB, Go tooling) interpret identically —
  * character classes, bounded repetition, alternation, `\b` word
  * boundaries; no lookarounds, no backreferences — so the oracle can run
  * the exact same patterns and the redaction is engine-portable by
  * construction. Order matters and is fixed: URL before email (a URL can
  * embed `user@host` userinfo), email before phone (digits in a local part
  * must not be re-interpreted once the email is gone).
  *
  * Scale shape: pure scalar projection over the scan — shuffle-free,
  * whole-stage-codegen'd, embarrassingly parallel at 100 TB.
  */
object Redaction {

  /** (name, pattern, replacement) in application order. */
  val patterns: Seq[(String, String, String)] = Seq(
    ("url", "https?://[A-Za-z0-9._~:/?#@!$&'()*+,;=%-]+", "[URL]"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\b(?:\\+?[0-9]{1,2}[ .-])?(?:\\([0-9]{3}\\)[ .-]?|[0-9]{3}[ .-])[0-9]{3}[ .-][0-9]{4}\\b", "[PHONE]"),
    ("ipv4", "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "[IP]"))

  /** Redact every pattern, in order. */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Count of matches for one named pattern (on the ORIGINAL text). */
  def countMatches(text: Column, name: String): Column = {
    val pat = patterns.collectFirst { case (`name`, p, _) => p }
      .getOrElse(sys.error(s"unknown PII pattern: $name"))
    size(regexp_extract_all(text, lit(pat), lit(0)))
  }

  /** Total PII hits across all patterns, counted the way [[redact]] sees
    * them: each pattern counts on the text AFTER the previous patterns were
    * replaced, so an email inside a URL is not double-counted. */
  def totalHits(text: Column): Column = {
    val (_, counts) = patterns.foldLeft((text, lit(0))) {
      case ((c, acc), (_, pat, repl)) =>
        (regexp_replace(c, pat, repl),
          acc + size(regexp_extract_all(c, lit(pat), lit(0))))
    }
    counts
  }
}
