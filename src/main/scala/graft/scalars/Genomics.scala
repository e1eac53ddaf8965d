package graft.scalars

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar function surface (SURVEY.md §2.7) as native
  * `Column` builders — every one composes codegen'd built-ins, no UDFs, so
  * all stay inside whole-stage codegen and push into parquet scans where
  * Catalyst can.
  */
object Genomics {

  /** DNA reverse complement (sequtils.py:3-15): upper-case, complement
    * A<->T / C<->G (N and others pass through), reverse. */
  def revComp(c: Column): Column =
    reverse(translate(upper(c), "ACGT", "TGCA"))

  /** Sample/project name normalization (reformat_metadata_file.py:294-345):
    * whitespace runs → '-', punctuation → '-', collapse '-' runs, strip
    * edge '-'. Underscores are preserved (they are id-significant). */
  def normalizeName(c: Column): Column = {
    val ws     = regexp_replace(c, "\\s+", "-")
    val punct  = regexp_replace(ws, "[^a-zA-Z0-9_-]", "-")
    val runs   = regexp_replace(punct, "-+", "-")
    regexp_replace(runs, "^-|-$", "")
  }

  /** Person-name normalization (reformat_metadata_file.py:294-318's
    * sample_name_reformat): like [[normalizeName]] but underscores are
    * punctuation too — ALL of string.punctuation maps to '-'. */
  def normalizePersonName(c: Column): Column = {
    val ws     = regexp_replace(c, "\\s+", "-")
    val punct  = regexp_replace(ws, "[^a-zA-Z0-9-]", "-")
    val runs   = regexp_replace(punct, "-+", "-")
    regexp_replace(runs, "^-|-$", "")
  }

  /** Composite dual index `index + '+' + index2`; single-index rows keep
    * just index (samplesheet.py:288-316). */
  def compositeIndex(i1: Column, i2: Column): Column =
    when(i2.isNull || i2 === "", i1).otherwise(concat_ws("+", i1, i2))

  /** Strip placeholder N bases from an index (samplesheet.py:135-167). */
  def stripN(c: Column): Column = translate(c, "Nn", "")

  /** 10X Chromium plate-code detection (samplesheet.py:66-67). */
  def is10xIndex(c: Column): Column = c.rlike("^SI-[GNT][ATN]-[A-Z][0-9]+$")

  /** Two-color-chemistry artifact: index1 all G (check_sequence_index_barcodes.py:344-349). */
  def isGHomopolymer(c: Column): Column = c.rlike("^G+$")

  /** Seqrun date from the `YYMMDD_...` run-folder prefix (seqrunutils).
    * Malformed prefixes yield null (error-frame convention) rather than the
    * ANSI parse exception `to_date` raises under Spark 4. */
  def seqrunDate(c: Column): Column = try_to_date(substring(c, 1, 6), "yyMMdd")

  /** Insert length = fragment length - 120, clamped at 0, comma-tolerant
    * input (reformat_metadata_file.py:395-416). */
  def insertLength(c: Column): Column =
    greatest(lit(0), regexp_replace(c.cast("string"), ",", "").cast("int") - 120)

  /** Project field cleanup: drop ':user' suffix (samplesheet.py:366-396). */
  def cleanProject(c: Column): Column = split(c, ":").getItem(0)

  /** FOV range string → int array (cosmxutils.py:189-211): "1,3,5" comma
    * lists and "a-b" inclusive ranges; any other shape — including a bare
    * "7", which the reference ALSO rejects (its non-comma branch requires
    * the a-b regex and raises ValueError) — yields null here, so bad rows
    * surface as filterable data instead of exceptions. */
  def fovRangeToList(c: Column): Column = {
    val start = regexp_extract(c, "^(\\d+)-(\\d+)$", 1)
    val end = regexp_extract(c, "^(\\d+)-(\\d+)$", 2)
    when(c.contains(","), transform(split(c, ","), x => trim(x).cast("int")))
      .otherwise(when(start =!= "", sequence(start.cast("int"), end.cast("int"))))
  }

  /** Email shape check (useradaptor.py:10-18). */
  def isEmail(c: Column): Column = c.rlike("^\\S+@\\S+$")
}
