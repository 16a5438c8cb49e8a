package graft

import graft.records.ZeroXref
import org.scalatest.funsuite.AnyFunSuite

/** The shared `$0` capture rules (ZeroXref) against the reference's
  * two behaviors, including the multiple-`$0` cases the round-12
  * advice flagged: MRK's re.search takes the FIRST digit-prefixed
  * `$0` (skipping non-digit-prefixed ones), XML's loop overwrite
  * takes the LAST `$0` node. */
class ZeroXrefSpec extends AnyFunSuite {

  test("MRK: first digit-prefixed $0 wins; non-digit-prefixed $0s are skipped") {
    assert(ZeroXref.mrk(Seq("42")) === Some(42L))
    assert(ZeroXref.mrk(Seq("42abc")) === Some(42L), "maximal digit run, suffix ignored")
    assert(ZeroXref.mrk(Seq("(DHLAUTH)42")) === None, "prefixed form captures nothing")
    assert(ZeroXref.mrk(Seq("(pfx)9", "42abc", "7")) === Some(42L),
      "re.search skips the non-digit-prefixed $0 and matches a later one")
    assert(ZeroXref.mrk(Seq("42", "7")) === Some(42L), "first digit-prefixed wins")
    assert(ZeroXref.mrk(Nil) === None)
    // documented divergence: the winning run overflows Long -> nothing
    assert(ZeroXref.mrk(Seq("99999999999999999999999", "5")) === None)
  }

  test("XML: last $0 node wins, digit-filtered whole") {
    assert(ZeroXref.xml(Seq("(DHLAUTH)42")) === Some(42L))
    assert(ZeroXref.xml(Seq("1", "(DHL)2")) === Some(2L),
      "the from_xml_raw loop overwrites per node: last wins")
    assert(ZeroXref.xml(Nil) === None)
    // documented divergences: digit-free or >Long last node -> nothing
    assert(ZeroXref.xml(Seq("42", "(none)")) === None)
    assert(ZeroXref.xml(Seq("99999999999999999999999")) === None)
  }
}
