package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.query._
import Fixtures._

/** Query-string language semantics ported from the reference corpus
  * (tests/test_marc.py:348-525). Counts assert against the canonical
  * fixture records evaluated by the row engine. */
class QuerySpec extends AnyFunSuite {

  def engine = new RowQueryEngine(Seq(bib1, bib2), Seq(auth1, auth2))

  test("exact subfield match") {
    assert(engine.runString("245__c:'title'").length == 2)
    assert(engine.runString("245__a:'This' AND 650__a:'Header'").map(_.id.get) == Seq(1L))
    assert(engine.runString("245__a:'This' OR 245__a:'Another'").length == 2)
  }

  test("regex on plain and auth-controlled fields") {
    val e2 = new RowQueryEngine(Seq(bib1, bib2),
      Seq(auth1, auth2, MarcRecord(recordType = "auth", id = Some(3L),
        fields = Vector(DataField("110", " ", " ",
          Vector(Subfield("a", Some("string")), Subfield("b", Some("part"))))))))
    assert(e2.runString("110__a:/string$/", "auth").map(_.id.get) == Seq(3L))
    assert(e2.runString("110__b:/^part/", "auth").map(_.id.get) == Seq(3L))
    assert(engine.runString("650__a:/[Hh]eader/").length == 2)
    assert(engine.runString("650__a:/header/i").length == 2)
  }

  test("double-quoted phrase in subfield, field, logical field") {
    assert(engine.runString("""520__a:"another description"""").length == 1)
    assert(engine.runString("""520__a:"another descrip"""").isEmpty) // whole words only
    assert(engine.runString("""520:"another description"""").length == 1)
    assert(engine.runString("""520:"another descrip"""").isEmpty)
    assert(engine.runString("""title:"is the"""").length == 2)
    assert(engine.runString("""title:"is t"""").isEmpty)
  }

  test("free text") {
    assert(engine.runString("header").length == 2)
    assert(engine.runString("Another header").length == 2)
    assert(engine.runString("\"Another-header\"").map(_.id.get) == Seq(1L))
    assert(engine.runString("Another -header").isEmpty) // both contain header
  }

  test("free text negation and truncation") {
    val only = MarcRecord(recordType = "bib", id = Some(9L),
      fields = Vector(DataField("245", " ", " ", Vector(Subfield("a", Some("Another thing"))))))
    val e2 = new RowQueryEngine(Seq(bib1, bib2, only), Seq(auth1, auth2))
    assert(e2.runString("Another -header").map(_.id.get) == Seq(9L))
    assert(e2.runString("anoth*").length == 3)
    assert(e2.runString("anoth* h*der").length == 2)
  }

  test("tag without subfield") {
    assert(engine.runString("245:'is the'").length == 2)
    assert(engine.runString("650:'Header'").length == 2)
    assert(engine.runString("650:/eader/").length == 2)
  }

  test("id and 001 search") {
    assert(engine.runString("id:1").map(_.id.get) == Seq(1L))
    assert(engine.runString("001:2").map(_.id.get) == Seq(2L))
    intercept[InvalidQueryString] { engine.runString("id:x") }
  }

  test("updated / created dates") {
    val t = java.time.Instant.parse("2026-08-12T10:00:00Z")
    val recs = Seq(bib1.copy(updated = Some(t)), bib2.copy(updated = Some(t)))
    val e2 = new RowQueryEngine(recs, Seq(auth1, auth2))
    assert(e2.runString("updated>1900-01-01").length == 2)
    assert(e2.runString("updated:2026-08-12").length == 2)
    assert(e2.runString("updated<1900-01-01").isEmpty)
  }

  test("xref search") {
    assert(engine.runString("xref:1").length == 2)
    assert(engine.runString("xref:2").map(_.id.get) == Seq(1L))
    assert(engine.runString("NOT xref:2").map(_.id.get) == Seq(2L))
  }

  test("wildcard strings") {
    assert(engine.runString("245__c:*itl*").length == 2)
    assert(engine.runString("245:titl*").length == 2)
    assert(engine.runString("650:head*").length == 2)
    assert(engine.runString("650__a:head*").length == 2)
  }

  test("logical field searches") {
    val extra = MarcRecord(recordType = "bib", id = Some(3L),
      fields = Vector(DataField("246", " ", " ", Vector(
        Subfield("a", Some("This title:")), Subfield("b", Some("is a title"))))))
    val e2 = new RowQueryEngine(Seq(bib1, bib2, extra), Seq(auth1, auth2))
    assert(e2.runString("title:'This title: is a title'").map(_.id.get) == Seq(3L))
    assert(e2.runString("title:*is*").length == 3)
    assert(e2.runString("title:this*").length == 2)
  }

  test("NOT on exact and text") {
    val bib = MarcRecord(recordType = "bib", id = Some(7L),
      fields = Vector(
        DataField("246", " ", " ", Vector(Subfield("a", Some("New title")))),
        DataField("246", " ", " ", Vector(Subfield("a", Some("Edited alt title"))))))
    val e2 = new RowQueryEngine(Seq(bib), Seq(auth1, auth2))
    assert(e2.runString("NOT 246:'New title'").isEmpty)
    assert(e2.runString("NOT 246:New title").isEmpty)
    assert(e2.runString("NOT xref:1").length == 1)
  }

  test("multi field + free text conjunction in any order") {
    val bib = MarcRecord(recordType = "bib", id = Some(7L),
      fields = Vector(
        DataField("246", " ", " ", Vector(Subfield("a", Some("New title")))),
        DataField("500", " ", " ", Vector(Subfield("a", Some("notes")))),
        DataField("520", " ", " ", Vector(Subfield("z", Some("Some words in a field"))))))
    val e2 = new RowQueryEngine(Seq(bib), Seq(auth1, auth2))
    assert(e2.runString("246:'New title' AND 500:'notes' AND some words in a field").length == 1)
    assert(e2.runString("246:'New title' AND some words in a field AND 500:'notes'").length == 1)
  }

  test("invalid query strings raise") {
    intercept[InvalidQueryString] { QueryParser.parse("invalid_field:value") }
    intercept[InvalidQueryString] { QueryParser.parse("245:title NOT 500:notes") }
    intercept[InvalidQueryString] { QueryParser.parse("245:title \"unclosed double quote") }
    intercept[InvalidQueryString] { QueryParser.parse("245:'title unclosed ' exact match") }
    intercept[InvalidQueryString] { QueryParser.parse("245:/title uncl/osed regex") }
    intercept[InvalidQueryString] { QueryParser.parse("NOT free text") }
    intercept[InvalidQueryString] { QueryParser.parse("245:x NOT 500:y") }
  }

  test("structured conditions (reference test_marc.py:295-340)") {
    import Cond._
    import CondVal._
    // Condition(tag, {code: value}) with auth-controlled resolution
    val c1 = QueryAst(Seq(FieldCond("245", Seq("a" -> Exact("This"), "b" -> Exact("is the")))))
    assert(engine.run(c1).map(_.id.get) == Seq(1L))
    val c2 = QueryAst(Seq(FieldCond("650", Seq("a" -> Exact("Header")))))
    assert(engine.run(c2).length == 2)
    // modifier not
    val c3 = QueryAst(Seq(FieldCond("245", Seq("a" -> Exact("This")), modifier = Some("not"))))
    assert(engine.run(c3).map(_.id.get) == Seq(2L))
    // exists / not_exists
    val c4 = QueryAst(Seq(FieldCond("520", Nil, modifier = Some("exists"))))
    assert(engine.run(c4).map(_.id.get) == Seq(1L))
    val c5 = QueryAst(Seq(FieldCond("520", Nil, modifier = Some("not_exists"))))
    assert(engine.run(c5).map(_.id.get) == Seq(2L))
    // Or
    val c6 = QueryAst(Seq(OrCond(Seq(
      FieldCond("245", Seq("a" -> Exact("This"))),
      FieldCond("245", Seq("a" -> Exact("Another")))))))
    assert(engine.run(c6).length == 2)
  }

  test("collation: strength-1 case-insensitive matching") {
    assert(engine.runString("245__a:'this'").map(_.id.get) == Seq(1L))
    assert(engine.runString("650:'header'").length == 2)
  }

  test("parser robustness: arbitrary input either parses or raises InvalidQueryString") {
    val gen = org.scalacheck.Gen.chooseNum(0, 40).flatMap(n =>
      org.scalacheck.Gen.listOfN(n, org.scalacheck.Gen.oneOf(
        org.scalacheck.Gen.alphaNumChar, org.scalacheck.Gen.oneOf(
          ':', '\'', '"', '/', '*', '-', ' ', '$', '\\', '`', '(', ')'))))
      .map(_.mkString)
    val params = org.scalacheck.Gen.Parameters.default
    (1 to 300).foreach { i =>
      val s = gen.pureApply(params, org.scalacheck.rng.Seed(i.toLong), 100)
      try QueryParser.parse(s)
      catch {
        case _: InvalidQueryString => // expected failure mode
        case e: Throwable => fail(s"parser crashed on <$s>: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
  }

  test("subfield/tag existence") {
    assert(engine.runString("245__a:*").length == 2)
    assert(engine.runString("520:*").map(_.id.get) == Seq(1L))
    assert(engine.runString("710__a:*").map(_.id.get) == Seq(1L))
  }

  test("collation sort key: numericOrdering puts A/9 before A/10") {
    // the reference's default collation is strength:1 +
    // numericOrdering:true (dlx/config.py:340) and applies to sorted
    // from_query (dlx/marc/__init__.py:122-124)
    val in = Seq("Symbol A/10", "Symbol A/9", "Symbol A/100", "Symbol B/2",
      "symbol a/11", "SYMBOL A/007")
    val sorted = in.sortBy(Collation.sortKey)
    assert(sorted == Seq("SYMBOL A/007", "Symbol A/9", "Symbol A/10",
      "symbol a/11", "Symbol A/100", "Symbol B/2"))
    // strength-1: case/diacritics collapse; numeric: leading zeros collapse
    assert(Collation.sortKey("A/007") == Collation.sortKey("a/7"))
    assert(Collation.sortKey("É/9") < Collation.sortKey("e/10"))
    // non-numeric strings reduce to plain strength-1 order
    assert(Collation.sortKey("abc") == "abc")
  }
}
