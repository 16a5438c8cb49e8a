package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import Fixtures._

/** Getter/setter semantics ported from the reference tests
  * (tests/test_marc.py:549-679). */
class MarcModelSpec extends AnyFunSuite {

  test("get_value basics") {
    assert(bib1.getValue("000") == "leader")
    assert(bib1.getValue("245", "a") == "This")
    assert(bib1.getValue("245", "b") == "is the")
    assert(bib1.getValue("245", "c") == "title")
    assert(bib1.getValue("520", "a") == "Description")
    assert(bib1.getValue("999", "z") == "")
  }

  test("get_value resolves linked subfields through the auth index") {
    assert(bib1.getValue("650", "a") == "Header")
    assert(bib1.getValue("710", "a") == "Another header")
  }

  test("get_values with repeated tags and subfields") {
    assert(bib1.getValues("520", "a") ==
      Vector("Description", "Another description", "Repeated subfield"))
    assert(bib1.getValues("245", "a", "b") == Vector("This", "is the"))
  }

  test("get_value with address") {
    assert(bib1.getValue("520", "a", address = Some((1, 1))) == "Repeated subfield")
    assert(bib1.getValue("520", "a", address = Some((0, 0))) == "Description")
  }

  test("get_tags / get_xrefs") {
    assert(bib1.getTags == Vector("000", "008", "245", "520", "650", "710"))
    assert(bib1.getXrefs().toSet == Set(1L, 2L))
    assert(bib1.getXref("650", "a").contains(1L))
  }

  test("get_fields sorted by tag, stable within tag") {
    val tags = bib1.getFields().map(_.tag)
    assert(tags == tags.sorted)
    val descriptions = bib1.getFields("520").collect { case d: DataField => d.getValue("a")(authLookup) }
    assert(descriptions == Vector("Description", "Another description"))
  }

  test("set replaces existing value in place") {
    val r = bib1.set("245", "a", "Changed")
    assert(r.getValue("245", "a") == "Changed")
    assert(r.getValue("245", "b") == "is the")
  }

  test("set appends new field with '+' place") {
    val r = bib1.set("520", "a", "Third", fieldPlace = Right("+"))
    assert(r.getValues("520", "a") ==
      Vector("Description", "Another description", "Repeated subfield", "Third"))
  }

  test("set creates field when tag absent") {
    val r = bib2.set("520", "a", "New description")
    assert(r.getValue("520", "a") == "New description")
  }

  test("set with field place addresses the n-th instance") {
    val r = bib1.set("520", "a", "Replaced", fieldPlace = Left(1))
    assert(r.getValues("520", "a") == Vector("Description", "Replaced", "Repeated subfield"))
  }

  test("set indicators") {
    val r = bib1.set("245", null, null, ind1 = Some("9"), ind2 = Some("8"))
    val f = r.getDataField("245").get
    assert(f.ind1 == "9" && f.ind2 == "8")
  }

  test("delete_field by tag and place") {
    val r = bib1.deleteField("520", 1)
    assert(r.getValues("520", "a") == Vector("Description"))
    val r2 = bib1.deleteFields("520", "650")
    assert(r2.getTags == Vector("000", "008", "245", "710"))
  }

  test("set_008 derives positions from the date field") {
    val withDate = bib1.set("269", "a", "1999-12-31")
    val now = java.time.Instant.parse("2026-08-12T00:00:00Z")
    val r = withDate.set008(now)
    val v = r.getValue("008")
    assert(v.startsWith("260812"))
    assert(v.substring(7, 11) == "1999")
  }

  test("heading field of an auth record") {
    assert(auth1.headingField.map(_.tag).contains("150"))
    assert(auth2.headingField.map(_.tag).contains("110"))
  }

  test("diff: a/b/c classification") {
    val d = Diff(bib1, bib2)
    assert(d.different)
    assert(d.c.exists(_.tag == "650")) // same 650 in both
    assert(d.a.exists(_.tag == "520")) // only in bib1
    assert(d.b.exists(_.tag == "245")) // 245 differs (values)
  }

  test("diff: d (order within tag) and e (duplication counts) drive difference") {
    val f1 = DataField("520", " ", " ", Vector(Subfield("a", Some("one"))))
    val f2 = DataField("520", " ", " ", Vector(Subfield("a", Some("two"))))
    val ra = MarcRecord(recordType = "bib", fields = Vector(f1, f2))
    val rb = MarcRecord(recordType = "bib", fields = Vector(f2, f1))
    val dd = Diff(ra, rb)
    assert(dd.a.isEmpty && dd.b.isEmpty)
    assert(dd.d.length == 2) // same fields, swapped positions
    assert(dd.different) // order difference alone makes them different

    val rc = MarcRecord(recordType = "bib", fields = Vector(f1))
    val rd = MarcRecord(recordType = "bib", fields = Vector(f1, f1))
    val de = Diff(rc, rd)
    assert(de.e.nonEmpty) // duplicated a different number of times
    assert(de.different)

    assert(!Diff(ra, ra.copy()).different)
  }

  test("diff: reference key semantics — empty subfields, $0 spelling, indicators") {
    // an empty-value subfield is invisible to membership (to_dict drops
    // it) but visible to e (to_mrk renders it)
    val withEmpty = MarcRecord(recordType = "bib", fields = Vector(
      DataField("245", " ", " ", Vector(Subfield("a", Some("x")), Subfield("b", Some(""))))))
    val withoutEmpty = MarcRecord(recordType = "bib", fields = Vector(
      DataField("245", " ", " ", Vector(Subfield("a", Some("x"))))))
    val d1 = Diff(withEmpty, withoutEmpty)
    assert(d1.a.isEmpty && d1.b.isEmpty && d1.c.length == 1)
    assert(d1.e.nonEmpty && d1.different)

    // linked subfield vs its literal $0 spelling: to_mrk-equal but
    // to_dict-unequal, so membership separates them
    val linked = MarcRecord(recordType = "bib", fields = Vector(
      DataField("650", " ", " ", Vector(Subfield("a", Some("Cats"), Some(5L))))))
    val literal = MarcRecord(recordType = "bib", fields = Vector(
      DataField("650", " ", " ", Vector(Subfield("a", Some("Cats")), Subfield("0", Some("5"))))))
    val d2 = Diff(linked, literal)
    assert(d2.a.nonEmpty && d2.b.nonEmpty && d2.c.isEmpty)

    // indicators participate in membership equality
    val i1 = MarcRecord(recordType = "bib", fields = Vector(
      DataField("100", "1", " ", Vector(Subfield("a", Some("n"))))))
    val i2 = MarcRecord(recordType = "bib", fields = Vector(
      DataField("100", "0", " ", Vector(Subfield("a", Some("n"))))))
    assert(Diff(i1, i2).a.nonEmpty && Diff(i1, i2).different)
  }

  test("zmerge fills missing values only") {
    val target = MarcRecord(recordType = "bib",
      fields = Vector(DataField("245", " ", " ", Vector(Subfield("a", Some("Mine"))))))
    val merged = target.zmerge(bib2)
    assert(merged.getValue("245", "a") == "Mine") // not overwritten
    assert(merged.getValue("245", "b") == "is the") // filled
    assert(merged.getValue("650", "a") == "Header") // filled via xref
  }

  test("xmerge overwrite semantics (reference test_marc.py:690-703)") {
    var b1 = MarcRecord(recordType = "bib")
      .set("000", null, "leader").set("245", "a", "Title")
    val b2base = MarcRecord(recordType = "bib")
      .set("000", null, "|eade|").set("269", "a", "Date")
    b1 = b1.zmerge(b2base)
    assert(b1.getValue("269", "a") == "Date")
    assert(b1.getValue("000") == "leader")
    val b2 = b2base.set("269", "a", "New date")
    val nonOver = b1.xmerge(b2, overwrite = false)
    assert(nonOver.getValue("269", "a") == "Date")
    val over = b1.xmerge(b2, overwrite = true)
    assert(over.getValue("269", "a") == "New date")
  }

  test("logical fields: title/subject/_record_type") {
    val lf = bib1.logicalFields()
    assert(lf("title") == Vector("This is the"))
    assert(lf("subject") == Vector("Header"))
    assert(lf("main_title") == Vector("This"))
    assert(lf("notes") == Vector("Description", "Another description Repeated subfield"))
    assert(lf("author") == Vector("Another header"))
    assert(lf("_record_type") == Vector("default", "bib"))
  }

  test("logical fields: bib_type_map tagging") {
    val speech = bib1.set("089", "b", "B22")
    val lf = speech.logicalFields()
    assert(lf("_record_type") == Vector("speech", "bib"))
  }

  test("auth logical fields") {
    val lf = auth1.logicalFields()
    assert(lf("heading") == Vector("Header"))
    assert(lf("subject") == Vector("Header"))
    assert(lf("thesaurus") == Vector("Header"))
    assert(lf("_record_type") == Vector("default", "auth"))
  }

  test("auth-control config change: stray linked subfields dropped on read") {
    // reference test_auth_control_config_changed + Datafield.from_dict
    // (dlx/marc/__init__.py:2458-2463): 710$a is controlled, 710$9 is
    // not — a stored/serialized $9 carrying an xref is ignored on read
    import graft.spark.{MarcSchema, MarcRow, DataFieldRow, SubfieldRow}
    val row = MarcRow(record_type = "bib", _id = 1L,
      created = null, updated = null, created_user = null, user = null,
      basket = null, leader = "",
      controlfields = Seq.empty,
      datafields = Seq(DataFieldRow("710", " ", " ", Seq(
        SubfieldRow("a", null, 1L), SubfieldRow("9", null, 1L)))),
      text = null, words = null, logical = null)
    val rec = MarcSchema.fromRow(row)
    assert(rec.getField("710").get.asInstanceOf[graft.model.DataField]
      .subfields.map(_.code) == Vector("a"))

    val json = """{"_id": 1, "710": [{"indicators": [" ", " "], "subfields": [
      {"code": "a", "xref": 1}, {"code": "9", "xref": 1}]}]}"""
    val fromJson = graft.records.Serialization.fromJson("bib", json)
    assert(fromJson.getField("710").get.asInstanceOf[graft.model.DataField]
      .subfields.map(_.code) == Vector("a"))
  }
}
