package graft.records

/** THE format-specific `$0` xref-capture rules, defined once (round-13
  * verdict #8: the digit-filter existed twice and the two copies had
  * already drifted on the multiple-`$0` case). Each rule maps the
  * document-ordered sequence of a field's `$0` subfield VALUES to the
  * captured xref; all three capture sites (the row-level MRK and XML
  * parsers, and the batch import resolver) call these.
  *
  * The REFERENCE differs by serialization, so the rules must too:
  *  - MRK (from_mrk, dlx/marc/__init__.py:1678): one
  *    `re.search(r'\$0(\d+)')` over the field body — the FIRST `$0`
  *    immediately followed by digits wins, and a non-digit-prefixed
  *    `$0` is skipped in favor of a later digit-prefixed one. The
  *    capture is the maximal digit run; a trailing non-digit suffix is
  *    ignored. (`$` is the subfield delimiter, so `\$0` can only match
  *    at a code-`0` subfield boundary — scanning the `$0` subfield
  *    values in order is exactly equivalent.)
  *  - XML (from_xml_raw, dlx/marc/__init__.py:1735-1738): the loop
  *    digit-filters EVERY `$0` node's whole text and overwrites the
  *    captured xref each time — the LAST `$0` node wins.
  *
  * Deliberate divergence, both forms (round-12, unchanged): a winning
  * `$0` whose digits are absent or overflow Long captures NOTHING and
  * the subfield falls back to value lookup, where the reference raises
  * ValueError on zero digits or carries an arbitrary-precision xref
  * that can never match a stored record — neither is useful. The
  * MRK rule stops at the first digit-prefixed `$0` even if its run
  * overflows (re.search would have matched there too).
  */
object ZeroXref {
  private val digitPrefix = "^\\d+".r

  /** First `$0` value with a leading digit run; capture that run. */
  val mrk: Seq[String] => Option[Long] = values =>
    values.iterator.map(digitPrefix.findPrefixOf)
      .collectFirst { case Some(d) => d }.flatMap(_.toLongOption)

  /** Last `$0` value, digit-filtered whole. */
  val xml: Seq[String] => Option[Long] = values =>
    values.lastOption.map(_.filter(c => c >= '0' && c <= '9'))
      .filter(_.nonEmpty).flatMap(_.toLongOption)
}
