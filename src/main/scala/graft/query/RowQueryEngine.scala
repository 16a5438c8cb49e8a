package graft.query

import graft.model._
import graft.config.DlxConfig
import graft.text.Tokenizer
import Cond._
import CondVal._

/** Strength-1 collation analog: case- and diacritic-insensitive
  * equality (the reference queries records with
  * marc_index_default_collation — dlx/config.py:340,
  * dlx/marc/__init__.py:122-124). */
object Collation {
  def normalize(s: String): String = {
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    nfd.replaceAll("""\p{Mn}""", "").toLowerCase(java.util.Locale.ROOT)
  }
  def eqv(a: String, b: String): Boolean = normalize(a) == normalize(b)

  /** Sort key matching the reference collation's `numericOrdering:
    * true` (dlx/config.py:340, applied to sorted `from_query` —
    * dlx/marc/__init__.py:122-124): strength-1 normalize, then each
    * ASCII digit run is replaced by a 4-digit length prefix + the run
    * with leading zeros stripped, so byte order == numeric order
    * ("A/9" sorts before "A/10"; "007" collates with "7", ICU primary
    * semantics). Precondition: digit runs < 10^4 digits. */
  def sortKey(s: String): String = {
    val n = normalize(s)
    val sb = new StringBuilder(n.length + 8)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < n.length && n.charAt(j) >= '0' && n.charAt(j) <= '9') j += 1
        val run = n.substring(i, j)
        val trimmed = run.dropWhile(_ == '0')
        val num = if (trimmed.isEmpty) "0" else trimmed
        sb.append(f"${num.length}%04d").append(num)
        i = j
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
  def in(v: String, set: Iterable[String]): Boolean = {
    val n = normalize(v)
    set.exists(x => normalize(x) == n)
  }
}

/** raw field text -> (scrubbed, words, distinct (code, value)) per tag. */
final case class TagIndexEntry(raw: String, text: String, words: Set[String],
    subfields: Seq[(String, String)])

/** Corpus-backed query evaluation over in-memory records.
  *
  * This is the executable semantic spec for the engine: the Spark
  * compiler (graft.spark.SparkQueryCompiler) produces plans with the
  * same semantics, with the tag/browse indexes as DataFrames and the
  * corpus-global value resolution as semi-joins. Mirrors the
  * reference's Mongo-filter semantics including quirks: zero text/
  * regex matches = match-nothing even under NOT; TagOnly/TagText auth
  * resolution uses the tag's FIRST configured source tag.
  */
final class RowQueryEngine(bibs: Seq[MarcRecord], authRecords: Seq[MarcRecord]) {

  val authIndex = new graft.auth.AuthIndex(authRecords)
  private implicit val lookup: AuthLookup = authIndex

  private def records(recordType: String): Seq[MarcRecord] =
    if (recordType == "auth") authRecords else bibs

  // ---- derived state: tag index, browse index, record text/words
  // (what Marc.commit maintains: dlx/marc/__init__.py:913-1063)


  private def fieldText(d: DataField): String =
    d.subfields.map(_.resolvedValue(lookup).getOrElse("")).mkString(" ")

  lazy val tagIndex: Map[String, Seq[TagIndexEntry]] = {
    val all = (bibs ++ authRecords).flatMap { r =>
      r.fields.collect { case d: DataField =>
        val text = fieldText(d)
        (d.tag, text, d.subfields.flatMap(s => s.resolvedValue(lookup).map(s.code -> _)))
      }
    }
    all.groupBy(_._1).view.mapValues { entries =>
      entries.groupBy(_._2).map { case (raw, group) =>
        TagIndexEntry(raw, " " + Tokenizer.scrub(raw) + " ",
          Tokenizer.tokenize(raw).toSet,
          group.flatMap(_._3).distinct)
      }.toSeq
    }.toMap
  }

  /** logical field -> distinct values with text/words (browse index,
    * dlx/marc/__init__.py:1019-1043). */
  lazy val browseIndex: Map[String, Seq[(String, Set[String], String)]] = {
    val all = (bibs ++ authRecords).flatMap { r =>
      r.logicalFields().toSeq.flatMap { case (f, vs) =>
        if (f == "_record_type") Nil else vs.map(f -> _)
      }
    }
    all.groupBy(_._1).view.mapValues { vs =>
      vs.map(_._2).distinct.map { v =>
        val scrubbed = Tokenizer.scrub(v)
        (v, Tokenizer.tokenize(scrubbed).toSet, " " + scrubbed + " ")
      }
    }.toMap
  }

  def recordText(r: MarcRecord): String =
    " " + r.fields.collect { case d: DataField => Tokenizer.scrub(fieldText(d)) }.mkString(" ") + " "

  def recordWords(r: MarcRecord): Set[String] =
    Tokenizer.tokenize(
      r.fields.collect { case d: DataField => Tokenizer.scrub(fieldText(d)) }.mkString(" ")).toSet

  // ---- value matching helpers

  private def rxMatches(rx: Rx, v: String): Boolean = {
    val flags = if (rx.ci) java.util.regex.Pattern.CASE_INSENSITIVE else 0
    java.util.regex.Pattern.compile(rx.pattern, flags).matcher(v).find()
  }

  private def valueMatches(cv: CondVal, v: String): Boolean = cv match {
    case Exact(s) => Collation.eqv(s, v)
    case TextMode(s) => Collation.eqv(s, v)
    case rx: Rx => rxMatches(rx, v)
    case Star => true
  }

  /** auths whose source-tag field has subfield (any code) with a value
    * in `values` — the xref-resolution read in TagOnly/TagText
    * (dlx/marc/query.py:210-228,332-346). */
  private def xrefsForValues(sourceTag: String, values: Seq[String]): Seq[Long] =
    authRecords.filter { a =>
      a.getFields(sourceTag).exists {
        case d: DataField => d.subfields.exists(s =>
          s.value.exists(v => Collation.in(v, values)))
        case _ => false
      }
    }.flatMap(_.id)

  private def firstSourceTag(recordType: String, tag: String): Option[String] =
    DlxConfig.authorityControlled(recordType).get(tag).map(_.values.head)

  /** tag-index entries matching a TextQuery (field-level $and:
    * words $all terms, $nin negated, phrase regex on padded text). */
  private def matchingEntries(tag: String, tq: TextQuery): Seq[TagIndexEntry] = {
    val terms = Tokenizer.tokenize(tq.terms)
    val negated = Tokenizer.tokenize(tq.negated.mkString(" ")).toSet
    tagIndex.getOrElse(tag, Nil).filter { e =>
      terms.forall(e.words.contains) &&
        (negated.isEmpty || !e.words.exists(negated.contains)) &&
        tq.phrases.forall(p => s"""\\b${java.util.regex.Pattern.quote(p)}\\b""".r
          .findFirstIn(e.text).isDefined)
    }
  }

  /** Resolve the concrete subfield values a text/regex condition
    * matches (the reference's parse-time materialization). */
  def resolveTagText(tag: String, code: Option[String], tq: TextQuery): Seq[String] = {
    val entries = matchingEntries(tag, tq)
    val candidates = entries.flatMap { e =>
      code match {
        case Some(c) => e.subfields.collect { case (`c`, v) => v }
        case None => e.subfields.map(_._2)
      }
    }.filter(_.nonEmpty)
    val stemmedTerms = Tokenizer.tokenize(tq.terms)
    candidates.filter { v =>
      val words = Tokenizer.tokenize(v)
      stemmedTerms.forall(words.contains)
    }.distinct
  }

  def resolveTagRegex(tag: String, code: Option[String], rx: Rx): Seq[String] =
    tagIndex.getOrElse(tag, Nil).flatMap { e =>
      (code match {
        case Some(c) => e.subfields.collect { case (`c`, v) => v }
        case None => e.subfields.map(_._2)
      }).filter(v => rxMatches(rx, v))
    }.distinct

  // ---- predicate evaluation

  def matches(ast: QueryAst, record: MarcRecord): Boolean =
    ast.conditions.forall(evaluate(_, record, ast.recordType))

  def run(ast: QueryAst): Seq[MarcRecord] =
    records(ast.recordType).filter(matches(ast, _))

  def runString(query: String, recordType: String = "bib"): Seq[MarcRecord] =
    run(QueryParser.parse(query, recordType))

  private def dataFieldsOf(r: MarcRecord, tag: String): Seq[DataField] =
    r.fields.collect { case d: DataField if d.tag == tag => d }

  def evaluate(cond: Cond, r: MarcRecord, recordType: String): Boolean = cond match {
    case AndCond(cs) => cs.forall(evaluate(_, r, recordType))
    case OrCond(cs) => cs.exists(evaluate(_, r, recordType))
    case MatchNothing => false

    case FieldCond(tag, subs, modifier, rt) =>
      // per-pair elemMatch; auth-controlled string values resolve to
      // xref sets against the source tag (Condition.compile,
      // dlx/marc/query.py:639-686)
      def pairPred(code: String, cv: CondVal): Subfield => Boolean = {
        if (DlxConfig.isAuthorityControlled(rt, tag, code)) {
          val xrefs: Seq[Long] = cv match {
            case Exact(s) => authLookupXrefs(rt, tag, code, Left(s))
            case TextMode(s) => authLookupXrefs(rt, tag, code, Left(s))
            case rx: Rx => authLookupXrefs(rt, tag, code, Right(rx))
            case Star => Nil
          }
          s => s.code == code && s.xref.exists(xrefs.contains)
        } else { s =>
          s.code == code && s.value.exists(v => valueMatches(cv, v))
        }
      }
      val preds = subs.map { case (c, v) => pairPred(c, v) }
      modifier match {
        case None =>
          // Mongo path semantics: each elemMatch satisfied by any field of the tag
          preds.forall(p => dataFieldsOf(r, tag).exists(_.subfields.exists(p)))
        case Some("not") =>
          // $not elemMatch: no single field satisfies all pairs
          !dataFieldsOf(r, tag).exists(f => preds.forall(p => f.subfields.exists(p)))
        case Some("exists") => r.fields.exists(_.tag == tag)
        case Some("not_exists") => !r.fields.exists(_.tag == tag)
        case Some(m) => throw new InvalidQueryString(s"Invalid modifier: $m")
      }

    case TagValue(tag, cv, not, rt) =>
      val anyValue = (f: DataField) => f.subfields.exists(_.value.exists(v => valueMatches(cv, v)))
      val xrefs: Seq[Long] = firstSourceTag(rt, tag) match {
        case Some(src) => cv match {
          case Exact(s) => xrefsForValues(src, Seq(s))
          case TextMode(s) => xrefsForValues(src, Seq(s))
          case rx: Rx => authRecords.filter(a => a.getFields(src).exists {
            case d: DataField => d.subfields.exists(_.value.exists(v => rxMatches(rx, v)))
            case _ => false
          }).flatMap(_.id)
          case Star => Nil
        }
        case None => Nil
      }
      val valueHit = dataFieldsOf(r, tag).exists(anyValue)
      val xrefHit = dataFieldsOf(r, tag).exists(_.subfields.exists(_.xref.exists(xrefs.contains)))
      if (!not) valueHit || (xrefs.nonEmpty && xrefHit)
      else !valueHit && !xrefHit

    case TagRegex(tag, code, rx, not, rt) =>
      val matched = resolveTagRegex(tag, code, rx)
      if (matched.isEmpty) false // reference returns match-nothing
      else tagInPredicate(r, tag, code, matched, not, rt)

    case TagText(tag, code, tq, not, rt) =>
      val matched = resolveTagText(tag, code, tq)
      if (matched.isEmpty) false
      else tagInPredicate(r, tag, code, matched, not, rt)

    case SubfieldExists(tag, code, not) =>
      val hit = dataFieldsOf(r, tag).exists(_.subfields.exists(_.code == code))
      if (not) !hit else hit

    case TagExists(tag, not) =>
      val hit = r.fields.exists(_.tag == tag)
      if (not) !hit else hit

    case IdEquals(id) => r.id.contains(id)

    case CtrlEquals(tag, value) =>
      r.fields.exists { case ControlField(t, v) => t == tag && Collation.eqv(v, value); case _ => false }

    case DateCompare(field, op, date) =>
      val ts = if (field == "created") r.created else r.updated
      ts.exists { t =>
        val d0 = date.atStartOfDay(java.time.ZoneOffset.UTC).toInstant
        op match {
          case "<" => !t.isAfter(d0)
          case ">" => !t.isBefore(d0)
          case _ =>
            val d1 = date.plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
            !t.isBefore(d0) && !t.isAfter(d1)
        }
      }

    case UserMatch(field, cv) =>
      val v = if (field == "user") r.user else r.createdUser
      v.exists(valueMatches(cv, _))

    case XrefRef(xref, not, rt) =>
      val tags = DlxConfig.authorityControlled(rt).keys.toSeq
      val hit = tags.exists(t => dataFieldsOf(r, t).exists(_.subfields.exists(_.xref.contains(xref))))
      if (not) !hit else hit

    case LogicalExists(field, not) =>
      val hit = r.logicalFields(field).get(field).exists(_.nonEmpty)
      if (not) !hit else hit

    case LogicalExact(field, value) =>
      r.logicalFields(field).getOrElse(field, Vector.empty).exists(Collation.eqv(_, value))

    case LogicalRx(field, rx, not) =>
      val values = browseIndex.getOrElse(field, Nil).map(_._1).filter(v => rxMatches(rx, v))
      if (values.isEmpty) false
      else {
        val hit = r.logicalFields(field).getOrElse(field, Vector.empty)
          .exists(v => Collation.in(v, values))
        if (not) !hit else hit
      }

    case LogicalText(field, tq, not) =>
      val terms = Tokenizer.tokenize(tq.terms)
      val negated = Tokenizer.tokenize(tq.negated.mkString(" ")).toSet
      val values = browseIndex.getOrElse(field, Nil).filter { case (_, words, text) =>
        terms.forall(words.contains) &&
          (negated.isEmpty || !words.exists(negated.contains)) &&
          tq.phrases.forall(p => s"""\\b${java.util.regex.Pattern.quote(p)}\\b""".r
            .findFirstIn(text).isDefined)
      }.map(_._1)
      if (values.isEmpty) false
      else {
        val hit = r.logicalFields(field).getOrElse(field, Vector.empty)
          .exists(v => Collation.in(v, values))
        if (not) !hit else hit
      }

    case FreeText(tq) =>
      val words = recordWords(r)
      val text = recordText(r)
      val terms = Tokenizer.tokenize(tq.terms).filterNot(Tokenizer.stopWords.contains)
      val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
      val termsOk = terms.forall(words.contains)
      val negOk = negated.isEmpty || !negated.exists(words.contains)
      val phraseOk = tq.phrases.forall { q =>
        val phrase = Tokenizer.scrub(q.stripPrefix("\"").stripSuffix("\""))
        s"""\\s${java.util.regex.Pattern.quote(phrase)}\\s""".r.findFirstIn(text).isDefined
      }
      val starOk = tq.starred.forall { st =>
        (" " + st.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")).r
          .findFirstIn(text).isDefined
      }
      termsOk && negOk && phraseOk && starOk
  }

  /** records-with-value-in-set predicate shared by regex/text
    * conditions, with the auth-controlled xref OR branch
    * (dlx/marc/query.py:203-230,326-348). */
  private def tagInPredicate(r: MarcRecord, tag: String, code: Option[String],
      matched: Seq[String], not: Boolean, rt: String): Boolean = {
    val inSet = (s: Subfield) =>
      code.forall(_ == s.code) && s.value.exists(v => Collation.in(v, matched))
    val valueHit = dataFieldsOf(r, tag).exists(_.subfields.exists(inSet))
    val xrefs = if (DlxConfig.authorityControlled(rt).contains(tag) &&
        code.forall(c => DlxConfig.isAuthorityControlled(rt, tag, c)))
      firstSourceTag(rt, tag).map(src => xrefsForValues(src, matched)).getOrElse(Nil)
    else Nil
    val xrefHit = dataFieldsOf(r, tag).exists(_.subfields.exists(_.xref.exists(xrefs.contains)))
    if (!not) valueHit || (xrefs.nonEmpty && xrefHit)
    else !valueHit && !(xrefs.nonEmpty && xrefHit)
  }

  /** Condition auth value -> xref list (Condition.compile,
    * dlx/marc/query.py:657-674): exact (collated) or regex match on
    * the (tag, code)-specific source tag. */
  private def authLookupXrefs(rt: String, tag: String, code: String,
      value: Either[String, Rx]): Seq[Long] = {
    val srcTag = DlxConfig.authoritySourceTag(rt, tag, code).getOrElse(return Nil)
    authRecords.filter { a =>
      a.getFields(srcTag).exists {
        case d: DataField => d.subfields.exists(s => s.code == code && s.value.exists { v =>
          value match {
            case Left(s2) => Collation.eqv(s2, v)
            case Right(rx) => rxMatches(rx, v)
          }
        })
        case _ => false
      }
    }.flatMap(_.id)
  }
}
