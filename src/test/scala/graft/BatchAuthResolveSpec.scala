package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.spark.{BatchAuthResolve, MarcSchema}
import Fixtures.authLookup

/** Batch parse-time auth resolution equals the row-level AuthIndex
  * semantics (xlookup / $0 capture / resolve_ambiguous,
  * dlx/marc/__init__.py:1676-1700, 1913-1993) — including both
  * disambiguation outcomes. */
class BatchAuthResolveSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark

  private def auth(id: Long, tag: String, subs: (String, String)*) = MarcRecord(
    recordType = "auth", id = Some(id),
    fields = Vector(DataField(tag, " ", " ",
      subs.toVector.map { case (c, v) => Subfield(c, Some(v)) })))

  private def bib(id: Long, subjectValue: String) = MarcRecord(
    recordType = "bib", id = Some(id),
    fields = Vector(
      DataField("245", " ", " ", Vector(Subfield("a", Some("T")))),
      DataField("650", " ", " ", Vector(Subfield("a", Some(subjectValue))))))

  private def xrefOf(rec: MarcRecord): Option[Long] =
    rec.fields.collectFirst { case d: DataField if d.tag == "650" => d }
      .flatMap(_.subfields.headOption).flatMap(_.xref)

  test("unique single match resolves; zero matches raise InvalidAuthValue") {
    val auths = MarcSchema.toDataset(spark,
      Seq(auth(1L, "150", "a" -> "Header"))).toDF()
    val out = BatchAuthResolve.resolve(spark, auths, "bib", Seq(bib(10L, "Header")))
    assert(xrefOf(out.head) === Some(1L))
    // resolved controlled subfields carry NO value (reference BSON)
    assert(out.head.fields.collect { case d: DataField if d.tag == "650" => d }
      .head.subfields.head.value.isEmpty)
    intercept[graft.records.InvalidAuthValue] {
      BatchAuthResolve.resolve(spark, auths, "bib", Seq(bib(11L, "Nope")))
    }
  }

  test("ambiguous match disambiguates by exact heading equality, or raises") {
    // auth 1 = exactly [a Header]; auth 4 = [a Header, x Extra]:
    // single-lookup sees two, the exact rule picks auth 1
    val resolvable = MarcSchema.toDataset(spark, Seq(
      auth(1L, "150", "a" -> "Header"),
      auth(4L, "150", "a" -> "Header", "x" -> "Extra"))).toDF()
    val out = BatchAuthResolve.resolve(spark, resolvable, "bib", Seq(bib(10L, "Header")))
    assert(xrefOf(out.head) === Some(1L))
    // two EXACT duplicates: nothing can disambiguate -> raise
    val dup = MarcSchema.toDataset(spark, Seq(
      auth(1L, "150", "a" -> "Header"),
      auth(5L, "150", "a" -> "Header"))).toDF()
    intercept[graft.records.AmbiguousAuthValue] {
      BatchAuthResolve.resolve(spark, dup, "bib", Seq(bib(10L, "Header")))
    }
  }

  test("repeated ambiguous codes: last value wins in lookup; tiebreak uses document order") {
    // field 650 $aP $aQ — both pairs individually ambiguous. The
    // containment lookup probes dict(zip(codes, values)) = {a: Q}
    // (LAST value per code, dlx xlookup_multi, __init__.py:1941-1965);
    // the exact tiebreak compares ALL pairs in DOCUMENT order against
    // the first-1XX heading field (resolve_ambiguous, 1967-1993).
    val auths = MarcSchema.toDataset(spark, Seq(
      auth(1L, "150", "a" -> "P"),
      auth(2L, "150", "a" -> "P"),
      auth(5L, "150", "a" -> "Q"),
      auth(7L, "150", "a" -> "P", "a" -> "Q"))).toDF()
    val rec = MarcRecord(recordType = "bib", id = Some(10L),
      fields = Vector(DataField("650", " ", " ",
        Vector(Subfield("a", Some("P")), Subfield("a", Some("Q"))))))
    val out = BatchAuthResolve.resolve(spark, auths, "bib", Seq(rec))
    val subs = out.head.fields.collect { case d: DataField => d }.head.subfields
    assert(subs.map(_.xref) === Vector(Some(7L), Some(7L)))
    // reversed document order [(a,Q),(a,P)] equals no heading exactly
    // (auth 7's heading is [(a,P),(a,Q)]) -> AmbiguousAuthValue
    val rev = MarcRecord(recordType = "bib", id = Some(11L),
      fields = Vector(DataField("650", " ", " ",
        Vector(Subfield("a", Some("Q")), Subfield("a", Some("P"))))))
    intercept[graft.records.AmbiguousAuthValue] {
      BatchAuthResolve.resolve(spark, auths, "bib", Seq(rev))
    }
  }

  test("$0 capture short-circuits every controlled subfield of the field") {
    val auths = MarcSchema.toDataset(spark,
      Seq(auth(1L, "150", "a" -> "Header"))).toDF()
    val rec = MarcRecord(recordType = "bib", id = Some(10L),
      fields = Vector(DataField("650", " ", " ", Vector(
        Subfield("a", Some("Totally unrelated")), Subfield("0", Some("7"))))))
    val out = BatchAuthResolve.resolve(spark, auths, "bib", Seq(rec))
    val d = out.head.fields.collect { case d: DataField => d }.head
    assert(d.subfields.map(_.code) === Vector("a"), "$0 must be stripped")
    assert(d.subfields.head.xref === Some(7L), "capture must win over lookup")
  }

  test("$0 capture is FORMAT-SPECIFIC: XML digit-filters, MRK wants a leading digit run") {
    val auths = MarcSchema.toDataset(spark,
      Seq(auth(1L, "150", "a" -> "Header"))).toDF()
    def rec(id: Long) = MarcRecord(recordType = "bib", id = Some(id),
      fields = Vector(DataField("650", " ", " ", Vector(
        Subfield("a", Some("Totally unrelated")), Subfield("0", Some("(DHLAUTH)42"))))))
    // XML rule (from_xml_raw, dlx 1735-1738): every digit of the text
    val xml = BatchAuthResolve.resolve(spark, auths, "bib", Seq(rec(10L)),
      zeroXref = BatchAuthResolve.xmlZeroXref)
    val dx = xml.head.fields.collect { case d: DataField => d }.head
    assert(dx.subfields.head.xref === Some(42L),
      "XML keeps only the digits of $0 text: (DHLAUTH)42 -> 42")
    // MRK rule (from_mrk, dlx 1678: re.search(r'\$0(\d+)')): the
    // prefixed form captures NOTHING -> the lookup path runs (and
    // raises here, since the value matches no auth)
    intercept[graft.records.InvalidAuthValue] {
      BatchAuthResolve.resolve(spark, auths, "bib", Seq(rec(11L)),
        zeroXref = BatchAuthResolve.mrkZeroXref)
    }
    // digit-free $0 captures nothing under EITHER rule
    val bad = MarcRecord(recordType = "bib", id = Some(12L),
      fields = Vector(DataField("650", " ", " ", Vector(
        Subfield("a", Some("No such heading")), Subfield("0", Some("(none)"))))))
    intercept[graft.records.InvalidAuthValue] {
      BatchAuthResolve.resolve(spark, auths, "bib", Seq(bad),
        zeroXref = BatchAuthResolve.xmlZeroXref)
    }
  }

  test("multiple $0 in the batch resolver: MRK first digit-prefixed, XML last node") {
    val auths = MarcSchema.toDataset(spark,
      Seq(auth(1L, "150", "a" -> "Header"))).toDF()
    def rec(id: Long, zeros: String*) = MarcRecord(recordType = "bib", id = Some(id),
      fields = Vector(DataField("650", " ", " ",
        Vector(Subfield("a", Some("Totally unrelated"))) ++
          zeros.map(z => Subfield("0", Some(z))))))
    // MRK: skip (pfx)9, land on 42abc (never reach 7) — dlx 1678
    val m = BatchAuthResolve.resolve(spark, auths, "bib",
      Seq(rec(20L, "(pfx)9", "42abc", "7")), zeroXref = BatchAuthResolve.mrkZeroXref)
    assert(m.head.fields.collect { case d: DataField => d }.head
      .subfields.head.xref === Some(42L))
    // XML: the per-node overwrite makes the LAST $0 win — dlx 1735-1738
    val x = BatchAuthResolve.resolve(spark, auths, "bib",
      Seq(rec(21L, "7", "(DHLAUTH)42")), zeroXref = BatchAuthResolve.xmlZeroXref)
    assert(x.head.fields.collect { case d: DataField => d }.head
      .subfields.head.xref === Some(42L))
  }
}
