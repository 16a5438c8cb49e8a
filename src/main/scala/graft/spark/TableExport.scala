package graft.spark

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-scale tabular export: the bulk form of
  * `TableSerialization.toTable` (reference to_table/to_csv,
  * dlx/marc/__init__.py to_table; SURVEY §2.2) as ONE explode+window
  * job over the records table — per-record Table rendering (q34's
  * row-wise path) exists to exercise the serializer; THIS is the plan
  * a 100 TB export runs: no driver-side objects, no per-row re-sort,
  * cells shuffle once on (record, column).
  *
  * Cell semantics mirror toTable: `place.tag$code` value cells with
  * `||`-joined repeated codes, `place.tag__` indicator cells (blank
  * indicators render '_'), `place.tag$0` carrying the field's xref,
  * and the `1.001` id column. `place` numbers repeated tags per
  * record in field order.
  */
object TableExport {

  def cells(records: DataFrame, writeId: Boolean = true): DataFrame = {
    val fields = records
      .select(col("_id"), posexplode(col("datafields")).as(Seq("fpos", "f")))
      .select(col("_id"), col("fpos"), col("f.tag").as("tag"),
        col("f.ind1").as("ind1"), col("f.ind2").as("ind2"),
        col("f.subfields").as("subfields"))
      .withColumn("place", row_number().over(
        Window.partitionBy(col("_id"), col("tag")).orderBy(col("fpos"))))

    def colName(suffix: Column): Column =
      concat(col("place"), lit("."), col("tag"), suffix)

    val indCells = fields.select(col("_id"),
      colName(lit("__")).as("col_name"),
      translate(concat(col("ind1"), col("ind2")), " ", "_").as("cell_value"))

    val subs = fields
      .select(col("_id"), col("place"), col("tag"),
        posexplode(col("subfields")).as(Seq("spos", "s")))

    // repeated codes within a field join with '||' (reference table
    // serialization contract), in subfield order
    val valueCells = subs
      .where(col("s.value").isNotNull)
      .groupBy(col("_id"), colName(concat(lit("$"), col("s.code"))).as("col_name"))
      .agg(concat_ws("||", transform(
        array_sort(collect_list(struct(col("spos").as("o"), col("s.value").as("v")))),
        x => x.getField("v"))).as("cell_value"))

    // the field's xref rides in $0 (last xref in subfield order wins,
    // like the row-wise serializer)
    val xrefCells = subs
      .where(col("s.xref").isNotNull)
      .groupBy(col("_id"), colName(lit("$0")).as("col_name"))
      .agg(max_by(col("s.xref"), col("spos")).cast("string").as("cell_value"))

    val base = indCells.unionByName(valueCells).unionByName(xrefCells)
    if (!writeId) base
    else base.unionByName(records.select(col("_id"),
      lit("1.001").as("col_name"), col("_id").cast("string").as("cell_value")))
  }
}
