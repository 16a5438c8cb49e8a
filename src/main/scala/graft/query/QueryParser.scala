package graft.query

import graft.config.DlxConfig
import Cond._
import CondVal._

/** Parser for the dlx search-string language — a faithful port of the
  * reference's quote/regex-aware tokenizer and token-shape matching
  * (Query.from_string, dlx/marc/query.py:22-524), minus the parse-time
  * database reads (those become execution-time joins).
  */
object QueryParser {

  /** Split on AND/OR/NOT outside quotes and regexes (reference
    * tokenize, dlx/marc/query.py:27-72). */
  private[query] def tokenize(string: String): Vector[String] = {
    var tokens = Vector.empty[String]
    val buffer = new StringBuilder
    var inSingle = false
    var inDouble = false
    var inRegex = false
    val opRe = """^(.*)(^|\s)(AND|OR|NOT)\s$""".r

    for (i <- string.indices) {
      val char = string.charAt(i)
      buffer.append(char)
      val buf = buffer.result()
      if (buf.length > 1 && buf.endsWith("':") && !inSingle) inSingle = true
      else if (char == '\'') inSingle = false
      else if (char == '/' && i > 0 && string.charAt(i - 1) == ':') inRegex = true
      else if (char == '/' && (i == 0 || string.charAt(i - 1) != '\\')) inRegex = false
      else if (char == '"' && !inSingle && !inRegex) inDouble = !inDouble

      if (!inSingle && !inDouble && !inRegex) {
        opRe.findFirstMatchIn(buf).foreach { m =>
          val term = m.group(1).trim
          val op = m.group(3)
          if (tokens.isEmpty || tokens.last != term) tokens :+= term
          tokens :+= op
          buffer.clear()
        }
      }
    }
    tokens :+= buffer.result().trim
    tokens = tokens.filter(_.nonEmpty)
    if (inSingle || inDouble) throw new InvalidQueryString("Unresolved quotes")
    if (inRegex) throw new InvalidQueryString("Unclosed regex")
    tokens
  }

  /** Regex literal detection: delimiters `/..../`, `\...\`, backticks,
    * optional trailing `i` (reference is_regex,
    * dlx/marc/query.py:74-86). */
  private def isRegexLiteral(s: String): Boolean = {
    val pairs = Seq(('/', '/'), ('\\', '\\'), ('`', '`'))
    for ((open, close) <- pairs) {
      if (s.length >= 2 && s.head == open &&
          (s.last == close || (s.length >= 3 && s.charAt(s.length - 2) == close && s.last == 'i')))
        return true
      else if (s.head == open)
        throw new InvalidQueryString(s"""Invalid regex: "$s"""")
    }
    false
  }

  /** Convert a term to exact/regex/wildcard/star/text (reference
    * process_string, dlx/marc/query.py:88-106). */
  private[query] def processString(s: String): CondVal = {
    if (s.nonEmpty && isRegexLiteral(s)) {
      if (s.last == 'i') Rx(s.substring(1, s.length - 2), ci = true)
      else Rx(s.substring(1, s.length - 1))
    } else if (s.contains("*")) {
      if (s == "*") Star
      else {
        // escape everything but the wildcards, then anchor
        val parts = s.split("\\*", -1).map(java.util.regex.Pattern.quote)
        var pattern = parts.mkString(".*")
        if (!pattern.startsWith(".*")) pattern = "^" + pattern
        if (!pattern.endsWith(".*")) pattern = pattern + "$"
        Rx(pattern, ci = true, fromWildcard = true)
      }
    } else TextMode(s)
  }

  private val fullyQualified = """(\d{3})(.)(.)([a-z0-9]):(.*)""".r
  private val tagOnlyRe = """(\d{3}):(.*)""".r
  private val idRe = """id:(.*)""".r
  private val dateRe = """(created|updated)([:<>])(.*)""".r
  private val userRe = """(created_user|user):(.*)""".r
  private val xrefRe = """xref:(.*)""".r
  private val logicalRe = """(\w+):(.*)""".r

  private def parseToken(token: String, recordType: String, not: Boolean): Cond = token match {
    case fullyQualified(tag, _, _, code, rawValue) =>
      processString(rawValue) match {
        case Star => SubfieldExists(tag, code, not)
        case TextMode(v) if v.startsWith("'") && v.endsWith("'") && v.length >= 2 =>
          FieldCond(tag, Seq(code -> Exact(v.substring(1, v.length - 1))),
            modifier = if (not) Some("not") else None, recordType = recordType)
        case TextMode(v) if v.startsWith("'") =>
          throw new InvalidQueryString(s"""Invalid exact match using single quote: "$token"""")
        case rx: Rx => TagRegex(tag, Some(code), rx, not, recordType)
        case TextMode(v) =>
          TagText(tag, Some(code), TextQuery.fielded(v), not, recordType)
        case _ => throw new InvalidQueryString(s"Unparseable: $token")
      }

    case tagOnlyRe(tag, rawValue) =>
      if (tag == "001") {
        rawValue.trim.toLongOption match {
          case Some(id) => IdEquals(id)
          case None => throw new InvalidQueryString("ID must be a number")
        }
      } else if (tag.startsWith("00")) {
        CtrlEquals(tag, rawValue)
      } else processString(rawValue) match {
        case Star => TagExists(tag, not)
        case TextMode(v) if v.startsWith("'") && v.endsWith("'") && v.length >= 2 =>
          TagValue(tag, Exact(v.substring(1, v.length - 1)), not, recordType)
        case TextMode(v) if v.startsWith("'") =>
          throw new InvalidQueryString(s"""Invalid exact match using single quote: "$token"""")
        case rx: Rx => TagRegex(tag, None, rx, not, recordType)
        case TextMode(v) => TagText(tag, None, TextQuery.fielded(v), not, recordType)
        case _ => throw new InvalidQueryString(s"Unparseable: $token")
      }

    case idRe(value) =>
      if (not) throw new InvalidQueryString("""modifier "not" not valid for ID search""")
      value.trim.toLongOption match {
        case Some(id) => IdEquals(id)
        case None => throw new InvalidQueryString("ID must be a number")
      }

    case dateRe(field, op, value) =>
      val date = try java.time.LocalDate.parse(value)
        catch { case _: Exception => throw new InvalidQueryString(s"Invalid date: $value") }
      DateCompare(field, op, date)

    case userRe(field, value) =>
      UserMatch(field, processString(value))

    case xrefRe(value) =>
      value.trim.toLongOption match {
        case Some(x) => XrefRef(x, not, recordType)
        case None => throw new InvalidQueryString("xref must be a number")
      }

    case logicalRe(rawField, rawValue) =>
      val field = rawField match {
        case "s" => "symbol"
        case "heading" => "subject"
        case other => other
      }
      val logicalNames = DlxConfig.bibLogicalFields.map(_._1) ++ DlxConfig.authLogicalFields.map(_._1)
      if (!logicalNames.contains(field))
        throw new InvalidQueryString(s"""Unrecognized query field "$rawField"""")
      if (rawValue == "*") LogicalExists(field, not)
      else if (rawValue.startsWith("'") && rawValue.endsWith("'") && rawValue.length >= 2)
        LogicalExact(field, rawValue.substring(1, rawValue.length - 1))
      else if (rawValue.startsWith("'"))
        throw new InvalidQueryString(s"""Invalid exact match using single quote: "$token"""")
      else processString(rawValue) match {
        case rx: Rx => LogicalRx(field, rx, not)
        case TextMode(v) => LogicalText(field, TextQuery.fielded(v), not)
        case Star => LogicalExists(field, not)
        case _ => throw new InvalidQueryString(s"Unparseable: $token")
      }

    case freeText =>
      FreeText(TextQuery.freeText(freeText))
  }

  /** NOT placement rules + OR folding + AND conjunction (reference
    * dlx/marc/query.py:472-522). */
  def parse(string: String, recordType: String = "bib"): QueryAst = {
    val trimmed = string.replaceAll("""^\s+""", "").replaceAll("""\s+$""", "")
    val rawTokens = tokenize(trimmed)

    // validate NOT placement, mark following token negated
    val parsed = new scala.collection.mutable.ArrayBuffer[AnyRef]
    var i = 0
    while (i < rawTokens.length) {
      val t = rawTokens(i)
      if (t == "NOT") {
        if (i > 0 && rawTokens(i - 1) != "AND" && rawTokens(i - 1) != "OR")
          throw new InvalidQueryString(""""NOT" must be preceeded by "AND", "OR"""")
        if (i + 1 >= rawTokens.length)
          throw new InvalidQueryString(""""NOT" can't be at end of search string""")
        if (!rawTokens(i + 1).matches("""^[^"']+:.*"""))
          throw new InvalidQueryString(""""NOT" not valid for all fields text search""")
        parsed += parseToken(rawTokens(i + 1), recordType, not = true)
        i += 2
      } else if (t == "AND" || t == "OR") {
        parsed += t
        i += 1
      } else {
        parsed += parseToken(t, recordType, not = false)
        i += 1
      }
    }

    // fold OR runs
    val conditions = new scala.collection.mutable.ArrayBuffer[Cond]
    val tokens = parsed.toVector
    val consumed = scala.collection.mutable.Set.empty[Int]
    var j = 0
    while (j < tokens.length) {
      if (tokens(j) == "OR" && !consumed.contains(j)) {
        val ors = scala.collection.mutable.ArrayBuffer[Cond](tokens(j - 1).asInstanceOf[Cond])
        consumed += (j - 1)
        var k = j
        while (k < tokens.length && tokens(k) == "OR") {
          ors += tokens(k + 1).asInstanceOf[Cond]
          consumed += k; consumed += (k + 1)
          k += 2
        }
        conditions += OrCond(ors.toSeq)
        j = k
      } else j += 1
    }
    // the rest joined as AND
    for ((t, idx) <- tokens.zipWithIndex
         if t != "AND" && t != "OR" && !consumed.contains(idx))
      conditions += t.asInstanceOf[Cond]

    QueryAst(conditions.toSeq, recordType)
  }
}
