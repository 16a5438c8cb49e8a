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

    // marc-import from an .mrk file
    val mrk = graft.records.Serialization.setToMrk(Seq(
      model.MarcRecord(recordType = "bib", id = Some(10L)).set("245", "a", "Imported title")))
    val mrkFile = s"$dir/import.mrk"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(mrkFile), mrk)
    graft.cli.MarcImport.main(Array(dir, "bib", mrkFile))
    assert(store.read("bib").where(col("_id") === 10L).count() == 1)

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
  }
}
