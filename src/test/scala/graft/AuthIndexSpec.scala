package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model._
import graft.auth.AuthIndex

/** Auth lookup semantics (reference dlx/marc/__init__.py:1832-2141). */
class AuthIndexSpec extends AnyFunSuite {

  val auths = Seq(
    Fixtures.auth1, // 150$a Header
    Fixtures.auth2, // 110$a Another header
    MarcRecord(recordType = "auth", id = Some(3L), fields = Vector(
      DataField("150", " ", " ", Vector(Subfield("a", Some("Dup")), Subfield("b", Some("one")))))),
    MarcRecord(recordType = "auth", id = Some(4L), fields = Vector(
      DataField("150", " ", " ", Vector(Subfield("a", Some("Dup")), Subfield("b", Some("two")))))),
    MarcRecord(recordType = "auth", id = Some(5L), fields = Vector(
      DataField("150", " ", " ", Vector(Subfield("a", Some("Tête")))),
      DataField("993", " ", " ", Vector(Subfield("a", Some("Tête-fr")))),
      DataField("994", " ", " ", Vector(Subfield("a", Some("Tête-es")))))))

  val idx = new AuthIndex(auths)

  test("lookup resolves heading subfield values") {
    assert(idx.lookup(1L, "a").contains("Header"))
    assert(idx.lookup(2L, "a").contains("Another header"))
    assert(idx.lookup(99L, "a").isEmpty)
    assert(idx.lookup(1L, "z").isEmpty)
  }

  test("language lookup reads the configured translation tag (993-997)") {
    assert(idx.lookup(5L, "a", "fr").contains("Tête-fr"))
    assert(idx.lookup(5L, "a", "es").contains("Tête-es"))
    // no translation tag configured for language -> fallback heading value
    assert(idx.lookup(5L, "a", "xx").contains("Tête"))
  }

  test("xlookup finds all ids by (source tag, code, value)") {
    assert(idx.xlookup("150", "a", "Header") == Seq(1L))
    assert(idx.xlookup("150", "a", "Dup").sorted == Seq(3L, 4L))
    assert(idx.xlookup("110", "a", "Another header") == Seq(2L))
    assert(idx.xlookup("150", "a", "missing").isEmpty)
  }

  test("xlookupMulti requires all pairs in the same source tag field") {
    assert(idx.xlookupMulti("150", Seq("a" -> "Dup", "b" -> "one")) == Seq(3L))
    assert(idx.xlookupMulti("150", Seq("a" -> "Dup", "b" -> "three")).isEmpty)
  }

  test("resolveAmbiguous picks the exact full-heading match") {
    // 650$a maps to source tag 150 for bibs
    assert(idx.resolveAmbiguous("bib", "650", Seq("a" -> "Header")).contains(1L))
    // 'Dup' alone matches two auths whose full headings differ -> None
    assert(idx.resolveAmbiguous("bib", "650", Seq("a" -> "Dup")).isEmpty)
  }

  test("partialLookup: case-insensitive contains, bounded") {
    val hits = idx.partialLookup("bib", "650", "a", "head")
    assert(hits.map(_._2).toSet == Set(1L))
    val all = idx.partialLookup("bib", "650", "a", "")
    assert(all.length <= 25)
  }

  test("listAttached / inUse over bib corpus") {
    val bibs = Seq(Fixtures.bib1, Fixtures.bib2)
    assert(idx.listAttached(bibs, 1L).flatMap(_.id).sorted == Seq(1L, 2L))
    assert(idx.inUse(bibs, 2L) == 1)
    assert(idx.inUse(bibs, 99L) == 0)
  }
}
