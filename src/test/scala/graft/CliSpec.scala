package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spark.MarcSchema
import Fixtures._

/** End-to-end CLI jobs over a real store (dlx scripts parity). */
class CliSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  test("import -> index rebuild -> auth merge pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("clistore").toString
    val store = new graft.store.MarcStore(spark, dir)
    // default auth_check: referenced auths must exist first
    store.commit(MarcSchema.toDataset(spark, Seq(auth1, auth2)), user = "t")
    store.commit(MarcSchema.toDataset(spark, Seq(bib1, bib2)), user = "t")

    // marc-import from an .mrk file: plain fields, an auth-controlled
    // 650$a that must resolve to a heading xref through the BATCH join
    // (never a driver collect of the auth table), and a $0-captured
    // field that must short-circuit resolution
    val mrk = graft.records.Serialization.setToMrk(Seq(
      model.MarcRecord(recordType = "bib", id = Some(10L)).set("245", "a", "Imported title"),
      model.MarcRecord(recordType = "bib", id = Some(11L))
        .set("245", "a", "Imported linked").set("650", "a", "Header"),
      model.MarcRecord(recordType = "bib", id = Some(12L))
        .set("245", "a", "Imported captured")
        .setXref("650", "a", 2L)))
    val mrkFile = s"$dir/import.mrk"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(mrkFile), mrk)
    graft.cli.MarcImport.main(Array(dir, "bib", mrkFile))
    assert(store.read("bib").where(col("_id") === 10L).count() == 1)
    def importedXref(id: Long): Set[Long] =
      store.read("bib").where(col("_id") === id)
        .select(explode(col("datafields")).as("f"))
        .where(col("f.tag") === "650")
        .select(explode(col("f.subfields")).as("s"))
        .select("s.xref").collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).toSet
    assert(importedXref(11L) == Set(1L), "650$a Header must batch-resolve to auth 1")
    assert(importedXref(12L) == Set(2L), "$0 capture must short-circuit to xref 2")

    // plan pin (round-9 verdict #4): the resolution is a JOIN against
    // the store's parquet-backed auth dimension — optimizer-visible,
    // no AuthIndex built from a driver collect
    {
      import spark.implicits._
      val probes = broadcast(Seq((0, 0, 0, "150", "a", "Header"))
        .toDF("rec", "fld", "sub", "src", "code", "value"))
      val frame = graft.spark.BatchAuthResolve.singlesFrame(
        probes, graft.spark.BatchAuthResolve.authSubs(store.read("auth").toDF()))
      frame.collect()
      val plan = frame.queryExecution.executedPlan.toString
      assert(plan.contains("Join"), "batch auth resolution must be a join")
      assert(plan.toLowerCase.contains("parquet"),
        "batch auth resolution must scan the auth store, not a collected copy")
    }

    // index rebuilds
    graft.cli.BuildTextCollections.main(Array(dir))
    val tagIdx = spark.read.parquet(s"$dir/tag_index")
    assert(tagIdx.where(col("tag") === "245").count() >= 3)
    graft.cli.BuildLogicalFields.main(Array(dir))
    val browse = spark.read.parquet(s"$dir/browse_index")
    assert(browse.where(col("field") === "title").count() >= 3)

    // init-indexes: one entry point materializes all three derived
    // indexes (dlx/scripts/init_indexes.py analog)
    graft.cli.InitIndexes.main(Array(dir))
    assert(spark.read.parquet(s"$dir/headings").where(col("tag") === "150").count() >= 1)
    assert(spark.read.parquet(s"$dir/tag_index").count() > 0)
    assert(spark.read.parquet(s"$dir/browse_index").count() > 0)

    // auth merge: move every xref 2 -> 1, delete auth 2
    graft.cli.AuthMerge.main(Array(dir, "1", "2"))
    val xrefs = store.read("bib").select(explode(col("datafields")).as("f"))
      .select(explode(col("f.subfields")).as("s"))
      .where(col("s.xref").isNotNull).select("s.xref")
      .collect().map(_.getLong(0)).toSet
    assert(xrefs == Set(1L))
    assert(store.read("auth").where(col("_id") === 2L).count() == 0)
    // merge_log stamped the losing/gaining pair with the acting user
    val ml = store.mergeLog.select("record_id", "action", "user")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(ml == Set((2L, "losing", "auth-merge"), (1L, "gaining", "auth-merge")))
  }

  test("auth merge refuses gaining == losing and nonexistent gaining") {
    val dir = java.nio.file.Files.createTempDirectory("climergeguard").toString
    val store = new graft.store.MarcStore(spark, dir)
    store.commit(MarcSchema.toDataset(spark, Seq(auth1, auth2)), user = "t")
    store.commit(MarcSchema.toDataset(spark, Seq(bib1, bib2)), user = "t")
    // self-merge would no-op the rewrite, pass the heading precondition
    // vacuously, and guard-skip-delete an auth records still reference
    val e1 = intercept[IllegalArgumentException](store.merge(gaining = 1L, losing = 1L))
    assert(e1.getMessage.contains("same auth"))
    // nonexistent gaining + reference-free losing would pass the
    // (empty) needed-codes check and delete losing for nothing
    val e2 = intercept[IllegalArgumentException](store.merge(gaining = 999L, losing = 2L))
    assert(e2.getMessage.contains("does not exist"))
    // neither refused merge touched the store: no merge_log rows, both
    // auths still live, bib xrefs unchanged
    assert(store.mergeLog.count() == 0)
    assert(store.read("auth").count() == 2)
  }

  test("heading-change cascade appends auth_linked_update_log rows") {
    val dir = java.nio.file.Files.createTempDirectory("clilog").toString
    val store = new graft.store.MarcStore(spark, dir)
    store.commit(MarcSchema.toDataset(spark, Seq(auth1, auth2)), user = "t")
    store.commit(MarcSchema.toDataset(spark, Seq(bib1, bib2)), user = "t")
    // change auth 1's heading value -> cascade refreshes attached bibs
    val changed = auth1.set("150", "a", "Renamed heading")
    store.commit(MarcSchema.toDataset(spark, Seq(changed)), user = "editor")
    val log = store.authLinkedUpdateLog
      .select("record_id", "action", "triggered_by")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val attachedIds = store.read("bib").toDF()
      .where(exists(col("datafields"), f => exists(f.getField("subfields"),
        sf => sf.getField("xref") === 1L)))
      .select("_id").collect().map(_.getLong(0)).toSet
    assert(attachedIds.nonEmpty)
    assert(log == attachedIds.map(id => (id, "updated", 1L)))
  }

  /** Minimal real xlsx: one sheet, all cells inline strings. */
  private def writeXlsx(rows: Seq[Seq[String]]): String = {
    val colRef = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        rows.zipWithIndex.map { case (cells, ri) =>
          s"""<row r="${ri + 1}">""" + cells.zipWithIndex.map { case (v, ci) =>
            s"""<c r="${colRef(ci)}${ri + 1}" t="inlineStr"><is><t xml:space="preserve">$v</t></is></c>"""
          }.mkString + "</row>"
        }.mkString + "</sheetData></worksheet>"
    val path = java.nio.file.Files.createTempFile("graft_cli", ".xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    zos.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    zos.write(sheet.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    path
  }

  test("excel_marc analog: xlsx to mrk, defaults merge splices the 008") {
    val data = writeXlsx(Seq(
      Seq("1.245$a", "1.269$a"),
      Seq("Resolution One", "1999-01-01")))
    val out = java.nio.file.Files.createTempFile("graft_cli", ".mrk").toString
    graft.cli.ExcelMarc.main(Array(data, "bib", "mrk", out))
    val mrk = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    assert(mrk == "=000  ****\n=245  \\\\$aResolution One\n=269  \\\\$a1999-01-01\n")

    // defaults workbook: 040 fills missing fields, 049/041 splice 008
    val defaults = writeXlsx(Seq(
      Seq("1.040$a", "1.049$a", "1.041$a"),
      Seq("NNUN", "e1", "engfre")))
    graft.cli.ExcelMarc.main(Array(data, "bib", "mrk", out, defaults))
    val merged = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    assert(merged.contains("=040  \\\\$aNNUN")) // zmerged from defaults
    val f008 = merged.linesIterator.find(_.startsWith("=008")).get.drop(6)
    assert(f008.length == 40)
    assert(f008.substring(7, 11) == "1999")  // pub year from 269$a (set_008)
    assert(f008.substring(15, 18) == "e1|")  // 049$a ljust(3,'|')
    assert(f008.substring(35, 38) == "eng")  // 041$a first 3
  }
}
