package graft.query

/** Query AST for the dlx search DSL.
  *
  * The reference resolves text terms and auth values against database
  * collections *at parse time* (dlx/marc/query.py:137-199,264-318),
  * emitting Mongo filter docs with concrete $in lists. Here parsing is
  * pure — the AST carries the original terms — and resolution happens
  * at compile/execution time: row engine (tests) or Spark plan (index
  * DataFrame semi-joins + broadcast auth dimension), letting Catalyst
  * plan what the reference hand-ordered.
  */
sealed trait CondVal
object CondVal {
  /** 'single-quoted' exact string */
  final case class Exact(s: String) extends CondVal
  /** /regex/ (or wildcard-derived regex); `ci` = trailing i flag */
  final case class Rx(pattern: String, ci: Boolean = false, fromWildcard: Boolean = false) extends CondVal
  /** unquoted term: text-search mode */
  final case class TextMode(raw: String) extends CondVal
  /** bare '*': existence check */
  case object Star extends CondVal
}

/** Decomposed free-text/phrase search input (reference Text.compile +
  * fielded text mode): `terms` is the residual string to stem,
  * `phrases` are scrubbed double-quoted spans, `negated` are scrubbed
  * -terms, `starred` keep their wildcards. */
final case class TextQuery(terms: String, phrases: Seq[String], negated: Seq[String],
    starred: Seq[String])

object TextQuery {
  import graft.text.Tokenizer

  /** Fielded text mode (dlx/marc/query.py:152-168): phrases +
    * negations extracted; starred terms stay in `terms` (they were
    * wildcard-converted earlier only for whole values). */
  def fielded(value: String): TextQuery = {
    val phrases = """"(.+?)"""".r.findAllMatchIn(value).map(m => Tokenizer.scrub(m.group(1))).toSeq
    val negRaw = """(^|\s)(-\w+)""".r.findAllMatchIn(value).map(_.group(2)).toSeq
    var residual = value
    negRaw.foreach { n => residual = residual.replace(n, "") }
    if (negRaw.nonEmpty && residual.trim.isEmpty)
      throw new InvalidQueryString("Search term can't contain only negations")
    TextQuery(residual, phrases, negRaw.map(Tokenizer.scrub), Nil)
  }

  /** Whole-record free text (reference Text.compile,
    * dlx/marc/query.py:703-751): also extracts *-terms. */
  def freeText(value: String): TextQuery = {
    val phrases = """(".+?")""".r.findAllMatchIn(value).map(_.group(1)).toSeq
    val negRaw = """(^|\s)(-\w+)""".r.findAllMatchIn(value).map(_.group(2)).toSeq
    val starred = value.split("""\s+""").filter(_.contains("*")).toSeq
    var residual = value
    (negRaw ++ starred).foreach { n => residual = residual.replace(n, "") }
    if (negRaw.nonEmpty && Tokenizer.tokenize(residual).forall(w => Tokenizer.stopWords.contains(w)))
      throw new InvalidQueryString("Search term can't contain only negations")
    TextQuery(residual, phrases, negRaw, starred)
  }
}

sealed trait Cond

object Cond {
  import CondVal._

  /** Structured condition: tag + (code -> value) pairs, all matching
    * within one field (reference Condition, dlx/marc/query.py:588-686). */
  final case class FieldCond(tag: String, subs: Seq[(String, CondVal)],
      modifier: Option[String] = None, recordType: String = "bib") extends Cond

  /** `650:value` — any subfield of the tag (reference TagOnly,
    * dlx/marc/query.py:779-825). */
  final case class TagValue(tag: String, value: CondVal, not: Boolean = false,
      recordType: String = "bib") extends Cond

  /** `245__a:text terms` / `650:text` — text-search mode resolved
    * against the tag index. code=None for tag-only. */
  final case class TagText(tag: String, code: Option[String], query: TextQuery,
      not: Boolean = false, recordType: String = "bib") extends Cond

  /** `245__a:/regex/` / `650:/regex/` — regex resolved against the
    * tag index values (code=None for tag-only). */
  final case class TagRegex(tag: String, code: Option[String], rx: CondVal.Rx,
      not: Boolean = false, recordType: String = "bib") extends Cond

  /** `245__a:*` — subfield existence. */
  final case class SubfieldExists(tag: String, code: String, not: Boolean = false) extends Cond

  /** `650:*` — tag existence. */
  final case class TagExists(tag: String, not: Boolean = false) extends Cond

  /** `id:N` / `001:N` */
  final case class IdEquals(id: Long) extends Cond

  /** `00X:value` — controlfield equality. */
  final case class CtrlEquals(tag: String, value: String) extends Cond

  /** `created/updated  : < >  yyyy-mm-dd` */
  final case class DateCompare(field: String, op: String, date: java.time.LocalDate) extends Cond

  /** `user:` / `created_user:` */
  final case class UserMatch(field: String, value: CondVal) extends Cond

  /** `xref:N` — any auth-controlled tag references auth N. */
  final case class XrefRef(xref: Long, not: Boolean = false, recordType: String = "bib") extends Cond

  /** logical field searches (`title:`, `symbol:` ...) */
  final case class LogicalExists(field: String, not: Boolean = false) extends Cond
  final case class LogicalExact(field: String, value: String) extends Cond
  final case class LogicalRx(field: String, rx: Rx, not: Boolean = false) extends Cond
  final case class LogicalText(field: String, query: TextQuery, not: Boolean = false) extends Cond

  /** whole-record free text */
  final case class FreeText(query: TextQuery) extends Cond

  final case class OrCond(conds: Seq[Cond]) extends Cond
  final case class AndCond(conds: Seq[Cond]) extends Cond
  /** matches no documents (reference {'_id': 0}) */
  case object MatchNothing extends Cond
}

final case class QueryAst(conditions: Seq[Cond], recordType: String = "bib")

class InvalidQueryString(msg: String) extends RuntimeException(msg)
