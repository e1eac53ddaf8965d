package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JSON-schema → Column compiler (SURVEY §2.7's validation row).
  *
  * The reference validates samplesheet/metadata rows with Draft4Validator
  * over per-row dicts (samplesheet.py:91-132, metadata_validation.py:213-308)
  * — a Python loop. Here the supported keyword subset (required, type,
  * pattern, enum, maxLength) compiles to native boolean Columns, so
  * validating 10^9 rows is one codegen'd projection; error rows come back
  * as data (filter on the error array), never as exceptions — the N+1 →
  * error-frame rewrite of SURVEY §7.4.
  */
object JsonSchemaValidator {

  final case class Rule(name: String, message: String, valid: Column)

  /** Compile a (subset) JSON schema document into rules against string
    * columns of a DataFrame. Unknown keywords are ignored, like permissive
    * validators do. */
  def compile(schemaJson: String, columns: Seq[String]): Seq[Rule] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val doc = JsonMethods.parse(schemaJson)
    // array-of-records schemas (the reference's validation_schema/*.json,
    // samplesheet.py:91-132) keep per-row properties under `items`; a row
    // DataFrame maps to one items object, so descend before compiling
    val root = doc \ "items" match {
      case JNothing => doc
      case items => items
    }
    val required: Seq[String] = root \ "required" match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _ => Nil
    }
    val props: Seq[(String, JValue)] = root \ "properties" match {
      case JObject(fields) => fields.map(f => f._1 -> f._2)
      case _ => Nil
    }
    val requiredRules = required.filter(columns.contains).map { f =>
      Rule(s"required:$f", s"missing required field $f",
        col(f).isNotNull && col(f) =!= "")
    }
    val propRules = props.filter { case (f, _) => columns.contains(f) }.flatMap {
      case (f, spec) =>
        val present = col(f).isNotNull && col(f) =!= ""
        val pattern = spec \ "pattern" match {
          case JString(p) =>
            Seq(Rule(s"pattern:$f", s"$f does not match $p",
              !present || col(f).rlike(p)))
          case _ => Nil
        }
        val enum_ = spec \ "enum" match {
          case JArray(vs) =>
            val allowed = vs.collect { case JString(s) => s }
            Seq(Rule(s"enum:$f", s"$f not in ${allowed.mkString("/")}",
              !present || col(f).isin(allowed: _*)))
          case _ => Nil
        }
        val maxLen = spec \ "maxLength" match {
          case JInt(n) =>
            Seq(Rule(s"maxLength:$f", s"$f longer than $n",
              !present || length(col(f)) <= n.toInt))
          case _ => Nil
        }
        val typed = spec \ "type" match {
          case JString("integer") =>
            Seq(Rule(s"type:$f", s"$f is not an integer",
              !present || col(f).rlike("^-?[0-9]+$")))
          case JString("number") =>
            Seq(Rule(s"type:$f", s"$f is not numeric",
              !present || col(f).rlike("^-?[0-9]+(\\.[0-9]+)?$")))
          case _ => Nil
        }
        pattern ++ enum_ ++ maxLen ++ typed
    }
    requiredRules ++ propRules
  }

  /** Document-level keywords (the array wrapper around the rows):
    * `minItems` and `uniqueItems` — the remaining keywords the reference's
    * shipped schemas use (cosmx count files, cosmxutils.py:374-420).
    * Returns violation names; distributed counts, no row collection. */
  def documentErrors(df: DataFrame, schemaJson: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val root = JsonMethods.parse(schemaJson)
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = root \ "minItems" match {
      case JInt(min) =>
        val c = df.count()
        if (c < min.toLong) errs += s"minItems:$min (got $c)"
        Some(c)
      case _ => None
    }
    root \ "uniqueItems" match {
      case JBool(true) =>
        val total = n.getOrElse(df.count())
        if (df.distinct().count() != total) errs += "uniqueItems"
      case _ => ()
    }
    errs.toSeq
  }

  /** Attach an `errors` array column: stable rule names of every violated
    * rule (prose lives in Rule.message for report rendering). */
  def withErrors(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val msgs = rules.map(r => when(!r.valid, lit(r.name)).otherwise(lit(null)))
    df.withColumn("errors",
      filter(array(msgs: _*), m => m.isNotNull))
  }

  /** Rows that violate at least one rule (the error report frame). */
  def errorRows(df: DataFrame, rules: Seq[Rule]): DataFrame =
    withErrors(df, rules).filter(size(col("errors")) > 0)
}
