package graft.spark

import graft.config.DlxConfig
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven codegen of the logical (denormalized browse) fields
  * as pure Column expressions — no UDFs, fully codegen'd (SURVEY
  * §2.9; reference Marc.logical_fields,
  * dlx/marc/__init__.py:1321-1347).
  *
  * Per configured (logical field, tag, code group): one value per
  * field instance = space-joined values of the group's codes in code
  * order. (The reference's per-code place walk stops at the first
  * empty value; this expression takes all non-empty values — the
  * same result for records without intra-code gaps.)
  */
object LogicalFields {

  private def fieldGroupValue(f: Column, codes: String): Column =
    concat_ws(" ", flatten(transform(
      array(codes.map(c => lit(c.toString)): _*),
      c => transform(
        filter(f.getField("subfields"), s =>
          s.getField("code") === c && s.getField("value").isNotNull && s.getField("value") =!= ""),
        s => s.getField("value")))))

  /** All values of one logical field, in config order. */
  def fieldValues(name: String, spec: Seq[(String, Seq[String])]): Column = {
    val parts: Seq[Column] = spec.flatMap { case (tag, groups) =>
      groups.map { group =>
        filter(
          transform(
            filter(col("datafields"), f => f.getField("tag") === tag),
            f => fieldGroupValue(f, group)),
          v => v =!= "")
      }
    }
    if (parts.isEmpty) array().cast("array<string>") else flatten(array(parts: _*))
  }

  /** First value of (tag, code) — reference get_value. */
  private def firstValue(tag: String, code: String): Column =
    try_element_at(flatten(transform(
      filter(col("datafields"), f => f.getField("tag") === tag),
      f => transform(
        filter(f.getField("subfields"), s => s.getField("code") === code),
        s => s.getField("value")))), lit(1))

  /** `_record_type` from the type map + defaults
    * (dlx/marc/__init__.py:1340-1345). */
  def recordTypeValues(recordType: String): Column = {
    val subtype = DlxConfig.bibTypeMap.foldLeft(lit("default")) {
      case (acc, (st, (tag, code, v))) =>
        when(firstValue(tag, code) === v, st).otherwise(acc)
    }
    array(subtype, lit(recordType))
  }

  /** The complete `logical` map column for a record type. */
  def logicalMap(recordType: String): Column = {
    val spec = DlxConfig.logicalFields(recordType)
    val entries: Seq[Column] = spec.flatMap { case (name, tagSpec) =>
      Seq(lit(name), fieldValues(name, tagSpec))
    } ++ Seq(lit("_record_type"), recordTypeValues(recordType))
    map(entries: _*)
  }

  /** Attach the logical map to a canonical records DataFrame. */
  def withLogical(df: org.apache.spark.sql.DataFrame, recordType: String): org.apache.spark.sql.DataFrame =
    df.withColumn("logical", logicalMap(recordType))
}
