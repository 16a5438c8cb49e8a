package graft.records

import graft.model._
import graft.config.DlxConfig
import scala.collection.mutable
import scala.util.matching.Regex

/** Tabular form: one record per row, `place.tag$code` data columns and
  * `place.tag__` indicator columns; repeated subfield values joined
  * with `||` in a cell; RFC-4180 quoting (reference
  * dlx/marc/__init__.py:145-284,393-431 + dlx/util.py:81-183).
  */
object TableSerialization {

  /** Ordered sparse table (reference util.Table). */
  final class Table {
    val index: mutable.LinkedHashMap[Int, mutable.LinkedHashMap[String, String]] =
      mutable.LinkedHashMap.empty
    var header: Vector[String] = Vector.empty

    def set(row: Int, field: String, value: String): this.type = {
      val r = index.getOrElseUpdate(row, mutable.LinkedHashMap.empty)
      r.get(field) match {
        case Some(existing) => r(field) = s"$existing||$value"
        case None => r(field) = value
      }
      if (!header.contains(field)) header :+= field
      this
    }

    def get(row: Int, field: String): Option[String] = index.get(row).flatMap(_.get(field))

    def toRows: Seq[Seq[String]] =
      header +: index.toSeq.sortBy(_._1).map { case (_, r) =>
        header.map(f => r.getOrElse(f, ""))
      }

    /** RFC-4180: quote a cell only when it contains the separator or a
      * quote; double embedded quotes (reference Table.serialize,
      * dlx/util.py:152-177). */
    def serialize(separator: String): String = {
      require(separator == "," || separator == "\t", "Separator must be ',' or tab")
      val rows = header +: index.toSeq.sortBy(_._1).map { case (_, r) =>
        header.map { f =>
          val v = r.getOrElse(f, "")
          if (v.contains(separator) || v.contains("\""))
            "\"" + v.replace("\"", "\"\"") + "\""
          else v
        }
      }
      rows.map(_.mkString(separator)).mkString("\n")
    }

    def toCsv: String = serialize(",")
    def toTsv: String = serialize("\t")

    def toHtml: String = {
      val trs = toRows.map(r => s"<tr>${r.map(v => s"<td>$v</td>").mkString}</tr>")
      s"<table>${trs.mkString}</table>"
    }
  }

  /** Build from raw rows (reference Table.__init__,
    * dlx/util.py:108-130): trailing blank header cells are trimmed off,
    * an interior blank header raises, and a non-empty data cell beyond
    * the last header raises. */
  def tableFromRows(rows: Seq[Seq[String]]): Table = {
    require(rows.nonEmpty, "Empty table")
    var header = rows.head.map(_.trim)
    header.indexWhere(_.isEmpty) match {
      case -1 =>
      case i =>
        if (header.drop(i).forall(_.isEmpty) || i == header.length - 1)
          header = header.take(i)
        else throw new IllegalArgumentException(
          s"Blank column header in ${header.mkString("[", ", ", "]")}")
    }
    val table = new Table
    table.header = header.toVector
    for ((row, ri) <- rows.tail.zipWithIndex) {
      if (row.drop(header.length).exists(_.nonEmpty))
        throw new IllegalArgumentException(s"Extra data in row $ri")
      for ((cell, ci) <- row.zipWithIndex if ci < header.length && cell.nonEmpty)
        table.set(ri + 1, header(ci), cell)
    }
    table
  }

  private val tagOfHeader: Regex = """\d+\.(\w{3})""".r
  private val placeOfHeader: Regex = """(\d+)\.""".r
  private val codeOfHeader: Regex = """\d+\.\d{3}\$?(\w)?""".r

  // Memo for the row-wise serializers (q34/q79 build a 1-record Table
  // PER ROW, so the same handful of header sets is re-sorted through
  // three regexes ~150k times per export — round 13, guide §1.2 "per-
  // task work"). Pure-function cache, bounded so adversarial header
  // streams cannot grow it; identical output by construction.
  private val headerSortCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[String], Seq[String]]()

  /** Drop the memo (Bench between-pass hygiene — round-13 verdict
    * finding #5: pass 1 otherwise pays the regex sorts and passes 2-3
    * don't, slightly flattering the q34/q79 medians). Semantically a
    * no-op: the cache is a pure-function memo. */
  def clearHeaderSortCache(): Unit = headerSortCache.clear()

  /** Header sort: by tag, then place group, then subfield code
    * ('$0' < '__' < letters) — reference sort_table_header
    * (dlx/marc/__init__.py:145-160). */
  def sortTableHeader(header: Seq[String]): Seq[String] = {
    def compute(hs: Seq[String]): Seq[String] = hs.sortBy { h =>
      val tag = tagOfHeader.findFirstMatchIn(h).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"Table header could not be parsed: $h"))
      val place = placeOfHeader.findFirstMatchIn(h).map(_.group(1).toInt).getOrElse(0)
      val code = codeOfHeader.findFirstMatchIn(h).flatMap(m => Option(m.group(1))).getOrElse("")
      (tag, place, code)
    }
    if (headerSortCache.size > 4096) compute(header)
    else headerSortCache.computeIfAbsent(header.toVector, compute(_))
  }

  /** Record set -> table (reference to_table,
    * dlx/marc/__init__.py:393-431): 1.001 column carries the id; only
    * datafields otherwise; indicators with ' ' rendered '_'; the
    * field's xref emitted into a $0 column. */
  def toTable(recs: Seq[MarcRecord], writeId: Boolean = true)(implicit auth: AuthLookup): Table = {
    val table = new Table
    for ((record, i0) <- recs.zipWithIndex) {
      val i = i0 + 1
      if (writeId && record.id.isDefined)
        table.set(i, "1.001", record.id.get.toString)
      else record.getField("001").foreach {
        case ControlField(_, v) => table.set(i, "1.001", v)
        case _ =>
      }
      for (tag <- record.getTags.filterNot(_.startsWith("00"));
           (field, p0) <- record.getFields(tag).zipWithIndex) {
        val place = p0 + 1
        field match {
          case d: DataField =>
            table.set(i, s"$place.${d.tag}__",
              (d.ind1 + d.ind2).map(c => if (c == ' ') '_' else c).mkString)
            var xref: Option[Long] = None
            for (s <- d.subfields) {
              table.set(i, s"$place.${d.tag}$$${s.code}", s.resolvedValue(auth).getOrElse(""))
              if (s.xref.isDefined) xref = s.xref
            }
            xref.foreach(x => table.set(i, s"$place.${d.tag}$$0", x.toString))
          case _ =>
        }
      }
    }
    table.header = sortTableHeader(table.header).toVector
    table
  }

  def toCsv(recs: Seq[MarcRecord], writeId: Boolean = true)(implicit auth: AuthLookup): String =
    toTable(recs, writeId).toCsv

  private val headerRe: Regex = """^(([1-9]\d*)\.)?(\d{3})(\$|__)?([a-z0-9])?""".r

  /** Table -> records (reference from_table, dlx/marc/__init__.py:
    * 162-284): header-addressed set with `__null__` placeholders, then
    * an auth-control validation pass using $0 xrefs or value lookup.
    * Repeated subfield codes are not supported. */
  def fromTable(table: Table, recordType: String, authControl: Boolean = true,
      deleteSubfieldZero: Boolean = true,
      fieldCheck: Option[String] = None,
      valueExists: (String, String, String) => Boolean = (_, _, _) => false)
      (implicit auth: AuthLookup): Seq[MarcRecord] = {
    val errors = mutable.Buffer.empty[String]
    val out = mutable.Buffer.empty[MarcRecord]

    for ((rowId, row) <- table.index) {
      var rec = MarcRecord(recordType = recordType)
      val headerFields = sortTableHeader(row.keys.toSeq)

      for (fieldName <- headerFields) {
        val value = row(fieldName)
        headerRe.findFirstMatchIn(fieldName) match {
          case None => errors += s"""Invalid column header "$fieldName""""
          case Some(m) =>
            val instance = Option(m.group(2)).map(_.toInt - 1).getOrElse(0)
            val tag = m.group(3)
            val isIndicator = m.group(4) == "__"
            val code = Option(m.group(5)).orNull

            lazy val existing = rec.getValue(tag, code, address = Some((instance, 0)))(AuthLookup.Empty)
            if (!isIndicator && existing.nonEmpty) {
              errors += s"Column header $instance.$tag$code is repeated"
            } else {
              if (tag == "001" && value.nonEmpty) rec = rec.copy(id = Some(value.trim.toLong))
              val haveField = rec.getField(tag, instance).isDefined
              val fp: Either[Int, String] = if (haveField) Left(instance) else Right("+")
              if (isIndicator) {
                if (value.isEmpty) ()
                else if (value.length == 2)
                  rec = rec.set(tag, null, null,
                    ind1 = Some(value.substring(0, 1)), ind2 = Some(value.substring(1, 2)),
                    fieldPlace = fp)
                else errors += s"Invalid indicators: $value"
              } else {
                rec = rec.set(tag, code, if (value.nonEmpty) value else "__null__", fieldPlace = fp)
              }
            }
        }
      }

      // validation pass
      var fields = Vector.empty[Field]
      for (f <- rec.fields) f match {
        case d: DataField =>
          if (d.subfields.forall(_.value.contains("__null__"))) ()
          else {
            var subs = d.subfields.map(s =>
              if (s.value.contains("__null__")) s.copy(value = Some("")) else s)
            // uniqueness check against existing records (reference
            // field_check, dlx/marc/__init__.py:237-241)
            for (fc <- fieldCheck; s <- subs
                 if fc == d.tag + s.code && s.value.exists(_.nonEmpty)
                    && valueExists(d.tag, s.code, s.value.get))
              errors += s"""${d.tag}$$${s.code}: "${s.value.get}" is already in the system"""
            if (authControl) {
              subs = subs.map { s =>
                if (s.value.exists(_.nonEmpty) &&
                    DlxConfig.isAuthorityControlled(recordType, d.tag, s.code)) {
                  d.getSubfield("0").flatMap(_.value).flatMap(_.toLongOption) match {
                    case Some(x) =>
                      if (auth.lookup(x, s.code).isDefined) Subfield(s.code, None, Some(x))
                      else { errors += s"Invalid xref $x for ${d.tag}$$${s.code}"; s }
                    case None =>
                      val srcTag = DlxConfig.authoritySourceTag(recordType, d.tag, s.code).getOrElse(d.tag)
                      auth.xlookup(srcTag, s.code, s.value.get) match {
                        case Seq(x) => Subfield(s.code, None, Some(x))
                        case Seq() => errors += s"Invalid auth value for ${d.tag}$$${s.code}: ${s.value.get}"; s
                        case _ =>
                          // >1 candidate: match the field's full set of
                          // auth-controlled subfields against a heading
                          // (reference resolve_ambiguous fallback,
                          // dlx/marc/__init__.py:264-270 — we link the
                          // resolved xref rather than the reference's
                          // xrefs.pop(), which ignores the resolution)
                          val pairs = d.subfields
                            .filter(x => DlxConfig.isAuthorityControlled(recordType, d.tag, x.code))
                            .flatMap(x => x.value.filterNot(v => v.isEmpty || v == "__null__").map((x.code, _)))
                          auth.resolveAmbiguous(recordType, d.tag, pairs) match {
                            case Some(x) => Subfield(s.code, None, Some(x))
                            case None =>
                              errors += s"Ambiguous auth value for ${d.tag}$$${s.code}: ${s.value.get}"; s
                          }
                      }
                  }
                } else s
              }
              if (deleteSubfieldZero) subs = subs.filterNot(_.code == "0")
            }
            fields :+= d.copy(subfields = subs)
          }
        case cf => fields :+= cf
      }
      out += rec.copy(fields = fields)
    }
    if (errors.nonEmpty) throw new IllegalArgumentException(errors.mkString("\n"))
    out.toSeq
  }

  /** Minimal RFC-4180 CSV parse (reference uses python csv.reader). */
  def parseCsv(s: String): Seq[Seq[String]] = {
    val rows = mutable.Buffer.empty[Seq[String]]
    var row = mutable.Buffer.empty[String]
    val cell = new StringBuilder
    var inQuotes = false
    var i = 0
    def endCell(): Unit = { row += cell.result(); cell.clear() }
    def endRow(): Unit = { endCell(); rows += row.toSeq; row = mutable.Buffer.empty }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { cell.append('"'); i += 1 }
          else inQuotes = false
        } else cell.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => endCell()
        case '\n' => endRow()
        case '\r' => // skip
        case other => cell.append(other)
      }
      i += 1
    }
    if (cell.nonEmpty || row.nonEmpty) endRow()
    rows.toSeq
  }

  def fromCsv(csv: String, recordType: String, authControl: Boolean = true)
      (implicit auth: AuthLookup): Seq[MarcRecord] = {
    val rows = parseCsv(csv).filter(_.exists(_.nonEmpty))
    require(rows.nonEmpty, "Empty CSV")
    fromTable(tableFromRows(rows), recordType, authControl)
  }
}
