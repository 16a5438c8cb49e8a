package graft

import graft.model._
import graft.auth.AuthIndex

/** Canonical fixtures from the reference test suite
  * (tests/conftest.py:5-89; reproduced in FIXTURES.md). */
object Fixtures {

  val bib1: MarcRecord = MarcRecord(
    recordType = "bib",
    id = Some(1L),
    fields = Vector(
      ControlField("000", "leader"),
      ControlField("008", "controlfield"),
      DataField("245", " ", " ", Vector(
        Subfield("a", Some("This")), Subfield("b", Some("is the")), Subfield("c", Some("title")))),
      DataField("520", " ", " ", Vector(Subfield("a", Some("Description")))),
      DataField("520", " ", " ", Vector(
        Subfield("a", Some("Another description")), Subfield("a", Some("Repeated subfield")))),
      DataField("650", " ", " ", Vector(Subfield("a", None, Some(1L)))),
      DataField("710", " ", " ", Vector(Subfield("a", None, Some(2L))))))

  val bib2: MarcRecord = MarcRecord(
    recordType = "bib",
    id = Some(2L),
    fields = Vector(
      ControlField("000", "leader"),
      DataField("245", " ", " ", Vector(
        Subfield("a", Some("Another")), Subfield("b", Some("is the")), Subfield("c", Some("title")))),
      DataField("650", " ", " ", Vector(Subfield("a", None, Some(1L))))))

  val auth1: MarcRecord = MarcRecord(
    recordType = "auth",
    id = Some(1L),
    fields = Vector(
      DataField("150", " ", " ", Vector(Subfield("a", Some("Header"))))))

  val auth2: MarcRecord = MarcRecord(
    recordType = "auth",
    id = Some(2L),
    fields = Vector(
      DataField("110", " ", " ", Vector(Subfield("a", Some("Another header"))))))

  val auths: AuthIndex = new AuthIndex(Seq(auth1, auth2))
  implicit val authLookup: AuthLookup = auths
}
