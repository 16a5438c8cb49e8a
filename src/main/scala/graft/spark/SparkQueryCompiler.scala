package graft.spark

import graft.config.DlxConfig
import graft.query._
import graft.query.Cond._
import graft.query.CondVal._
import graft.text.Tokenizer
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compiles the query AST to Catalyst Column predicates over the
  * canonical MarcRow schema.
  *
  * Where the reference performs parse-time database reads
  * (dlx/marc/query.py:137-199: resolve text/regex terms against
  * `_index_<tag>`, auth values against `auths`), this compiler
  * resolves against the tagIndex/browseIndex/authHeadings DataFrames.
  *
  * Execution strategy (SCALING.md):
  *  - `run` routes top-level positive text/regex conditions through
  *    LEFT SEMI joins against the index DataFrames — never a driver
  *    materialization, so an arbitrarily broad term is safe at 100 TB.
  *  - Conditions that must become Column predicates (nested in OR,
  *    negated, logical-field text/regex) resolve to `isin` in-lists
  *    capped at the reference's limit (dlx/marc/query.py:194-199).
  *    Past the cap the behavior mirrors the reference exactly: REGEX
  *    conditions degrade to a direct regex predicate over the record's
  *    own values (query.py:194-206 falls back to a raw Condition);
  *    TEXT conditions RAISE InvalidQueryString ("too many hits ...
  *    Try narrowing the search", query.py:313-318, 452-458). The
  *    semi-join path above is the deliberate divergence: a top-level
  *    positive text search never resolves an in-list at all, so it
  *    has no cap to exceed.
  *  - Resolved auth XREF lists (the reference collects these uncapped,
  *    query.py:340-358) are capped at `maxResolvedXrefs`; past the cap
  *    the matching heading slice stays a DataFrame and the predicate
  *    becomes a distributed flag join (`filterFrame`) — never a
  *    megabyte-scale driver INSET against a grown authority file.
  * Structural conditions compile to pure higher-order-function
  * expressions (exists/filter over the datafields array) — fully
  * codegen'd, no UDFs on the hot path.
  */
final class SparkQueryCompiler(spark: SparkSession, bibs: DataFrame, auths: DataFrame,
    maxResolvedValues: Int = 10000, maxResolvedBytes: Int = 1 << 20,
    maxResolvedXrefs: Int = 131072) {

  import MarcContext._

  MarcContext.registerFunctions(spark)

  // Not cached by default: per-query tag filters push down through the
  // aggregation to the scan, so a one-shot query only tokenizes the
  // queried tag's fields. Call cacheIndexes() for repeated querying.
  lazy val tagIdx: DataFrame = tagIndex(bibs.unionByName(auths))
  lazy val browseIdx: DataFrame = browseIndex(bibs.unionByName(auths))
  lazy val headings: DataFrame = authHeadings(auths)

  def cacheIndexes(): this.type = {
    tagIdx.cache(); browseIdx.cache(); headings.cache(); this
  }

  /** Index restricted to one tag: prunes the datafields array BEFORE
    * the explode so a single-tag resolution never shuffles the other
    * tags' fields (the explode can't see through a post-hoc filter). */
  private def tagIdxFor(tag: String): DataFrame = {
    if (tagIdx.storageLevel.useMemory) tagIdx.where(col("tag") === tag)
    else tagIndex(bibs.unionByName(auths).withColumn("datafields",
      filter(col("datafields"), f => f.getField("tag") === tag)))
  }

  /** One-tag RESOLUTION entries without the index aggregate: the
    * tagIndex groupBy(tag, raw) exists only to dedup entries for the
    * materialized index; for query resolution the per-field rows carry
    * the same (text, words, subfields) semantics and the value set is
    * `.distinct()`ed at the end — so skip the shuffle entirely and
    * derive field-level entries straight off the records scan. Uses
    * the cached index when one exists. */
  private def tagEntriesFor(tag: String): DataFrame = {
    if (tagIdx.storageLevel.useMemory)
      tagIdx.where(col("tag") === tag).select("raw", "text", "words", "subfields")
    else {
      val fieldText = concat_ws(" ", transform(col("f").getField("subfields"),
        s => coalesce(s.getField("value"), lit(""))))
      bibs.unionByName(auths)
        .select(explode(filter(col("datafields"), f => f.getField("tag") === tag)).as("f"))
        .select(fieldText.as("raw"), col("f.subfields").as("subfields"))
        .withColumn("text", concat(lit(" "), scrubUdf(col("raw")), lit(" ")))
        .withColumn("words", tokenizeUdf(col("raw")))
    }
  }

  private def records(recordType: String): DataFrame =
    if (recordType == "auth") auths else bibs

  /** Default execution path: top-level positive text/regex conditions
    * run as LEFT SEMI joins against the index DataFrames (no driver
    * materialization, no size cap — the 100 TB-safe plan); everything
    * else compiles to Column predicates, where any residual index
    * resolution is capped at the reference's in-list limit
    * (dlx/marc/query.py:194-199) with a direct-predicate fallback. */
  def run(ast: QueryAst): DataFrame = runSemiJoin(ast)

  def run(query: String, recordType: String = "bib"): DataFrame =
    run(QueryParser.parse(query, recordType))

  /** The pure-predicate path (collected in-lists, capped): used by
    * history queries and tests; `run` prefers the semi-join plan. */
  def runInList(ast: QueryAst): DataFrame =
    filterFrame(records(ast.recordType), ast)

  def runInList(query: String, recordType: String = "bib"): DataFrame =
    runInList(QueryParser.parse(query, recordType))

  /** The unbounded-match execution path (SCALING.md): top-level
    * positive text/regex conditions become LEFT SEMI joins against the
    * index DataFrames instead of collected in-lists — no driver
    * materialization, no size cap. Catalyst/AQE picks broadcast vs
    * shuffled semi join from runtime sizes. Remaining conditions
    * compile to predicates as usual. */
  def runSemiJoin(ast: QueryAst): DataFrame = {
    val rt = ast.recordType
    val (joinable, rest) = ast.conditions.partition {
      case TagText(_, _, _, false, _) => true
      case TagRegex(_, _, _, false, _) => true
      case _ => false
    }
    var df = records(rt)
    if (rest.nonEmpty) {
      val p = new Pending
      val pred = rest.map(compileCond(_, rt, p)).reduce(_ && _)
      df = applyFlags(df, p, pred, Seq("_id"))
    }

    for (cond <- joinable) {
      val (tag, code, matchedValues: DataFrame) = cond match {
        case TagRegex(t, c, rx, _, _) =>
          (t, c, tagRegexValues(t, c, rx).select(normalizeCol(col("v")).as("mnorm")).distinct())
        case TagText(t, c, tq, _, _) =>
          (t, c, tagTextValues(t, c, tq).select(normalizeCol(col("v")).as("mnorm")).distinct())
        case other => throw new IllegalStateException(other.toString)
      }
      // records whose tag subfields hit the matched values; prune the
      // array to the tag BEFORE the explode so the generate never
      // materializes the other tags' fields
      val exploded = df
        .select(col("_id").as("rid"),
          explode(filter(col("datafields"), f => f.getField("tag") === tag)).as("f"))
        .select(col("rid"), explode(col("f.subfields")).as("s"))
      val codeScoped = code.map(c => exploded.where(col("s.code") === c)).getOrElse(exploded)
      val valueHits = codeScoped
        .where(col("s.xref").isNull) // linked subfields match via xref branch
        .join(matchedValues, normalizeCol(col("s.value")) === col("mnorm"))
        .select("rid")
      // auth xref OR branch: heading values in the matched set
      val xrefHits =
        if (DlxConfig.authorityControlled(rt).contains(tag) &&
            code.forall(c => DlxConfig.isAuthorityControlled(rt, tag, c))) {
          val src = DlxConfig.authorityControlled(rt)(tag).values.head
          val xrefDf = headings.where(col("tag") === src)
            .join(matchedValues, col("norm_value") === col("mnorm"))
            .select(col("xref").as("mxref")).distinct()
          exploded.join(xrefDf, col("s.xref") === col("mxref")).select("rid")
        } else df.sparkSession.emptyDataFrame.withColumn("rid", lit(0L)).limit(0).select("rid")
      val hits = valueHits.union(xrefHits).distinct()
      df = df.join(hits, df("_id") === hits("rid"), "left_semi")
    }
    df
  }

  def runSemiJoin(query: String, recordType: String): DataFrame =
    runSemiJoin(QueryParser.parse(query, recordType))

  /** Sorted from_query: the reference applies its default collation
    * (strength 1, numericOrdering:true — dlx/config.py:340) to BOTH
    * matching and sorting (dlx/marc/__init__.py:122-124), so a sort on
    * a field value must put "A/9" before "A/10". Orders the matched
    * records by the numeric-aware collation sort key of the FIRST
    * (sortTag, sortCode) value (Mongo sorts a document by its array
    * path's first element for our single-instance heading fields),
    * tiebreak _id for determinism. The key is a plain codegen'd string
    * expression, so this is one ordinary Spark Sort — range-partitioned
    * and spillable at scale, no collation comparator UDF. */
  def runSorted(query: String, recordType: String, sortTag: String, sortCode: String,
      ascending: Boolean = true): DataFrame = {
    val matched = runSemiJoin(QueryParser.parse(query, recordType))
    val firstVal = try_element_at(flatten(transform(
      filter(col("datafields"), f => f.getField("tag") === sortTag),
      f => transform(filter(f.getField("subfields"), sf => sf.getField("code") === sortCode),
        sf => sf.getField("value")))), lit(1))
    val key = sortKeyCol(firstVal)
    matched.orderBy(
      (if (ascending) key.asc_nulls_last else key.desc_nulls_last),
      col("_id").asc)
  }

  /** Pure-Column compile, for callers that AND the predicate into
    * their own plan (q58's Raw escape hatch). Over-cap xref branches
    * need a join the caller would have to apply, so this path refuses
    * them — production queries run through `run`/`filterFrame`, which
    * degrade distributively instead. */
  def compile(ast: QueryAst): Column = {
    val p = new Pending
    val c = ast.conditions.map(compileCond(_, ast.recordType, p))
      .reduceOption(_ && _).getOrElse(lit(true))
    if (p.flags.nonEmpty) throw new InvalidQueryString(
      s"Query resolves more than $maxResolvedXrefs auth xrefs; " +
        "run it through run/filterFrame (distributed xref join) or narrow the search")
    c
  }

  /** Apply the compiled predicate of `ast` to `df` — any frame with
    * the canonical `datafields` column and a unique `keys` tuple
    * (live records: `_id`; history: `(_id, version_no)`). Over-cap
    * xref branches become per-flag joins: df's tag-scoped subfield
    * xrefs join the matching heading slice, the distinct key set
    * left-joins back as a boolean column, and the predicate reads the
    * flag — composable under NOT/OR, never a driver materialization. */
  def filterFrame(df: DataFrame, ast: QueryAst, keys: Seq[String] = Seq("_id")): DataFrame = {
    val p = new Pending
    val pred = ast.conditions.map(compileCond(_, ast.recordType, p))
      .reduceOption(_ && _).getOrElse(lit(true))
    applyFlags(df, p, pred, keys)
  }

  private def applyFlags(df: DataFrame, p: Pending, pred: Column, keys: Seq[String]): DataFrame = {
    if (p.flags.isEmpty) return df.where(pred)
    var out = df
    for (fl <- p.flags) {
      val sub = df.select(keys.map(col) :+
          explode(filter(col("datafields"), f => f.getField("tag") === fl.tag)).as("__f"): _*)
        .select(keys.map(col) :+ explode(col("__f.subfields")).as("__s"): _*)
      val scoped = fl.code.map(c => sub.where(col("__s.code") === c)).getOrElse(sub)
      val hits = scoped.join(fl.hits, col("__s.xref") === col("mxref"))
        .select(keys.map(col): _*).distinct()
        .withColumn(fl.name, lit(true))
      out = out.join(hits, keys, "left")
    }
    out.where(pred).drop(p.flags.map(_.name).toSeq: _*)
  }

  // ---- resolution against the derived DataFrames. Collected VALUE
  // in-lists are capped at the reference's limit (dlx/marc/query.py:
  // 194-199: 1 MB serialized); past the cap, regex conditions fall
  // back to a direct predicate over the record (query.py:194-206) and
  // text conditions raise (query.py:313-318) — the reference's exact
  // split. Resolved XREF lists (uncapped driver lists in the
  // reference) are capped at maxResolvedXrefs (131,072 longs = the
  // same 1 MB discipline); past the cap the branch becomes a pending
  // flag join instead of an INSET.

  /** A resolved xref branch: a driver in-list while it fits, or —
    * past maxResolvedXrefs — the matching heading slice kept as a
    * DataFrame (col "mxref") for a distributed flag join. */
  private sealed trait XrefSet { def nonEmpty: Boolean }
  private case class XrefList(xrefs: Seq[Long]) extends XrefSet { def nonEmpty = xrefs.nonEmpty }
  private case class XrefFrame(hits: DataFrame) extends XrefSet { def nonEmpty = true }

  /** One pending flag join: records whose `tag` field carries a
    * subfield (optionally code-scoped) with an xref in `hits`.
    * (A plain class, not a case class: 2.13 deprecates the widened
    * `apply` a private case class constructor would generate.) */
  private final class XrefFlag(val name: String, val tag: String,
      val code: Option[String], val hits: DataFrame)

  private final class Pending {
    val flags = scala.collection.mutable.ArrayBuffer.empty[XrefFlag]
    private var n = 0
    def flag(tag: String, code: Option[String], hits: DataFrame): Column = {
      val nm = s"__xref_hit_$n"; n += 1
      flags += new XrefFlag(nm, tag, code, hits)
      coalesce(col(nm), lit(false))
    }
  }

  /** Collect the distinct xrefs of a heading-dimension hit frame
    * unless they exceed maxResolvedXrefs (longs are fixed-width, so
    * the row cap IS the reference-style byte cap). */
  private def resolveXrefSet(hit: DataFrame): XrefSet = {
    val distinctXrefs = hit.select("xref").distinct()
    val rows = distinctXrefs.limit(maxResolvedXrefs + 1).collect()
    if (rows.length > maxResolvedXrefs) XrefFrame(distinctXrefs.select(col("xref").as("mxref")))
    else XrefList(rows.iterator.map(_.getLong(0)).toSeq)
  }

  /** Collect a single-string-column DataFrame unless it exceeds the
    * caps (row-count guard + the reference's 1 MB byte cap);
    * None = too big, use the fallback predicate. */
  private def collectCapped(values: DataFrame): Option[Seq[String]] = {
    val rows = values.limit(maxResolvedValues + 1).collect()
    if (rows.length > maxResolvedValues) None
    else {
      val vs = rows.iterator.map(_.getString(0)).filter(_ != null).toSeq
      if (vs.iterator.map(_.length).sum > maxResolvedBytes) None else Some(vs)
    }
  }

  private def normalize(s: String): String = Collation.normalize(s)

  private def rxFilter(rx: Rx): Column = {
    val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
    col("v").rlike(pattern)
  }

  private def tagRegexValues(tag: String, code: Option[String], rx: Rx): DataFrame = {
    val subs = tagEntriesFor(tag)
      .select(explode(col("subfields")).as("s"))
      .select(col("s.code").as("c"), col("s.value").as("v"))
    code.map(c => subs.where(col("c") === c)).getOrElse(subs)
      .where(col("v").isNotNull && rxFilter(rx))
      .select("v").distinct()
  }

  private def tagTextValues(tag: String, code: Option[String], tq: TextQuery): DataFrame = {
    val terms = Tokenizer.tokenize(tq.terms)
    val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
    var entries = tagEntriesFor(tag)
    terms.foreach(t => entries = entries.where(array_contains(col("words"), t)))
    negated.foreach(t => entries = entries.where(!array_contains(col("words"), t)))
    tq.phrases.foreach { p =>
      entries = entries.where(col("text").rlike("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))
    }
    val values = entries.select(explode(col("subfields")).as("s"))
      .select(col("s.code").as("c"), col("s.value").as("v"))
    val scoped = code.map(c => values.where(col("c") === c)).getOrElse(values)
      .where(col("v").isNotNull && col("v") =!= "")
    // value-level term containment evaluated in the cluster (not on the
    // driver): each value must itself contain every stemmed term
    terms.foldLeft(scoped)((d, w) => d.where(array_contains(tokenizeUdf(col("v")), w)))
      .select("v").distinct()
  }

  /** subfield values matched by a regex in the tag index (capped;
    * None = beyond the reference's in-list limit). */
  def resolveTagRegex(tag: String, code: Option[String], rx: Rx): Option[Seq[String]] =
    collectCapped(tagRegexValues(tag, code, rx))

  /** subfield values matched by field-level text search + value-level
    * term containment (capped). */
  def resolveTagText(tag: String, code: Option[String], tq: TextQuery): Option[Seq[String]] =
    collectCapped(tagTextValues(tag, code, tq))

  /** auth ids whose source-tag heading subfield (code-scoped) matches. */
  private def authXrefs(rt: String, tag: String, code: String, value: Either[String, Rx]): XrefSet = {
    DlxConfig.authoritySourceTag(rt, tag, code) match {
      case None => XrefList(Nil)
      case Some(src) =>
        val base = headings.where(col("tag") === src && col("code") === code)
        val hit = value match {
          case Left(s) => base.where(col("norm_value") === normalize(s))
          case Right(rx) => base.where({
            val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
            col("value").rlike(pattern)
          })
        }
        resolveXrefSet(hit)
    }
  }

  /** auth ids whose FIRST source tag of `tag` has any subfield value in
    * the set (TagOnly/TagText resolution, dlx/marc/query.py:210-228). */
  private def xrefsForValues(rt: String, tag: String, values: Seq[String]): XrefSet =
    DlxConfig.authorityControlled(rt).get(tag).map(_.values.head) match {
      case None => XrefList(Nil)
      case Some(src) =>
        resolveXrefSet(headings.where(col("tag") === src &&
          col("norm_value").isin(values.map(normalize): _*)))
    }

  // ---- Column predicate builders over the canonical schema

  private def fieldsOf(tag: String): Column =
    filter(col("datafields"), f => f.getField("tag") === tag)

  private def existsField(tag: String, pred: Column => Column): Column =
    exists(fieldsOf(tag), pred)

  private def subMatch(code: Option[String], valuePred: Column => Column): Column => Column =
    f => exists(f.getField("subfields"), s =>
      code.map(c => s.getField("code") === c).getOrElse(lit(true)) && valuePred(s))

  /** Reference BSON stores NO value key on linked subfields
    * (dlx/marc/__init__.py:2689-2725) — a value predicate can only
    * match literal subfields; xref-carrying ones match via the xref
    * branch. The canonical MarcRow materializes linked values for
    * display/serialization, so every value predicate carries an
    * explicit `xref IS NULL` guard to reproduce the reference
    * semantics (QueryParitySpec found the divergence). */
  private def literalOnly(pred: Column => Column): Column => Column =
    s => s.getField("xref").isNull && pred(s)

  private def normValueIn(values: Seq[String]): Column => Column =
    literalOnly(s => normalizeCol(s.getField("value")).isin(values.map(normalize): _*))

  private def xrefIn(xrefs: Seq[Long]): Column => Column =
    s => if (xrefs.isEmpty) lit(false) else s.getField("xref").isin(xrefs: _*)

  def compileCond(cond: Cond, rt: String): Column = {
    val p = new Pending
    val c = compileCond(cond, rt, p)
    if (p.flags.nonEmpty) throw new InvalidQueryString(
      s"Condition resolves more than $maxResolvedXrefs auth xrefs; " +
        "run it through run/filterFrame (distributed xref join) or narrow the search")
    c
  }

  private def compileCond(cond: Cond, rt: String, pnd: Pending): Column = cond match {
    case AndCond(cs) => cs.map(compileCond(_, rt, pnd)).reduce(_ && _)
    case OrCond(cs) => cs.map(compileCond(_, rt, pnd)).reduce(_ || _)
    case MatchNothing => lit(false)

    case FieldCond(tag, subs, modifier, _) =>
      // Left = subfield-level predicate; Right = record-level flag
      // column (over-cap xref branch, code-scoped flag join)
      def pairPred(code: String, cv: CondVal): Either[Column => Column, Column] = {
        if (DlxConfig.isAuthorityControlled(rt, tag, code)) {
          val xrefs = cv match {
            case Exact(s) => authXrefs(rt, tag, code, Left(s))
            case TextMode(s) => authXrefs(rt, tag, code, Left(s))
            case rx: Rx => authXrefs(rt, tag, code, Right(rx))
            case Star => XrefList(Nil)
          }
          xrefs match {
            case XrefList(xs) => Left(s => s.getField("code") === code && xrefIn(xs)(s))
            case XrefFrame(hits) => Right(pnd.flag(tag, Some(code), hits))
          }
        } else {
          val valuePred: Column => Column = cv match {
            case Exact(v) => s => normalizeCol(s.getField("value")) === normalize(v)
            case TextMode(v) => s => normalizeCol(s.getField("value")) === normalize(v)
            case rx: Rx =>
              val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
              s => s.getField("value").rlike(pattern)
            case Star => _ => lit(true)
          }
          Left(s => s.getField("code") === code && literalOnly(valuePred)(s))
        }
      }
      lazy val preds = subs.map { case (c, v) => pairPred(c, v) }
      modifier match {
        case None =>
          // each pair independently requires SOME field of the tag to
          // match it, so a record-level flag substitutes directly
          preds.map {
            case Left(p) => existsField(tag, f => exists(f.getField("subfields"), p))
            case Right(flag) => flag
          }.reduce(_ && _)
        case Some("not") =>
          // all pairs must match within the SAME field; a record-level
          // flag loses that constraint, so it only composes when it is
          // the lone pair (then field-level and record-level coincide)
          preds match {
            case Seq(Right(flag)) => !flag
            case ps if ps.forall(_.isLeft) =>
              val fns = ps.collect { case Left(fn) => fn }
              !existsField(tag, f =>
                fns.map(fn => exists(f.getField("subfields"), fn)).reduce(_ && _))
            case _ => throw new InvalidQueryString(
              s"NOT condition on $tag resolves more than $maxResolvedXrefs auth xrefs " +
                "alongside other subfield constraints. Try narrowing the search")
          }
        case Some("exists") => size(fieldsOf(tag)) > 0
        case Some("not_exists") => size(fieldsOf(tag)) === 0
        case Some(m) => throw new InvalidQueryString(s"Invalid modifier: $m")
      }

    case TagValue(tag, cv, not, _) =>
      val valuePred: Column => Column = cv match {
        case Exact(v) => s => normalizeCol(s.getField("value")) === normalize(v)
        case TextMode(v) => s => normalizeCol(s.getField("value")) === normalize(v)
        case rx: Rx =>
          val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
          s => s.getField("value").rlike(pattern)
        case Star => _ => lit(true)
      }
      val xrefs: XrefSet = cv match {
        case Exact(v) => xrefsForValues(rt, tag, Seq(v))
        case TextMode(v) => xrefsForValues(rt, tag, Seq(v))
        case rx: Rx =>
          DlxConfig.authorityControlled(rt).get(tag).map(_.values.head) match {
            case None => XrefList(Nil)
            case Some(src) =>
              val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
              resolveXrefSet(headings.where(col("tag") === src && col("value").rlike(pattern)))
          }
        case Star => XrefList(Nil)
      }
      val valueHit = existsField(tag, subMatch(None, literalOnly(valuePred)))
      val xrefHit = xrefHitCol(tag, xrefs, pnd)
      if (!not) (if (xrefs.nonEmpty) valueHit || xrefHit else valueHit)
      else !valueHit && !xrefHit

    case TagRegex(tag, code, rx, not, _) =>
      resolveTagRegex(tag, code, rx) match {
        // reference quirk: zero matches = match-nothing, even under NOT
        case Some(matched) if matched.isEmpty => lit(false)
        case Some(matched) => inSetPredicate(rt, tag, code, matched, not, pnd)
        case None => directRegexPredicate(rt, tag, code, rx, not, pnd)
      }

    case TagText(tag, code, tq, not, _) =>
      resolveTagText(tag, code, tq) match {
        case Some(matched) if matched.isEmpty => lit(false)
        case Some(matched) => inSetPredicate(rt, tag, code, matched, not, pnd)
        case None => throw new InvalidQueryString(
          s"""Text search "${tq.terms}" has too many hits on field "$tag". Try narrowing the search""")
      }

    case SubfieldExists(tag, code, not) =>
      val hit = existsField(tag, subMatch(Some(code), _ => lit(true)))
      if (not) !hit else hit

    case TagExists(tag, not) =>
      val hit = size(fieldsOf(tag)) > 0 || exists(col("controlfields"), c => c.getField("tag") === tag)
      if (not) !hit else hit

    case IdEquals(id) => col("_id") === id

    case CtrlEquals(tag, value) =>
      exists(col("controlfields"), c =>
        c.getField("tag") === tag && normalizeCol(c.getField("value")) === normalize(value))

    case DateCompare(field, op, date) =>
      val c = col(field)
      val d0 = java.sql.Timestamp.from(date.atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
      val d1 = java.sql.Timestamp.from(date.plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant)
      op match {
        case "<" => c <= lit(d0)
        case ">" => c >= lit(d0)
        case _ => c >= lit(d0) && c <= lit(d1)
      }

    case UserMatch(field, cv) =>
      val c = if (field == "user") col("user") else col("created_user")
      cv match {
        case Exact(v) => normalizeCol(c) === normalize(v)
        case TextMode(v) => normalizeCol(c) === normalize(v)
        case rx: Rx => c.rlike(if (rx.ci) "(?i)" + rx.pattern else rx.pattern)
        case Star => c.isNotNull
      }

    case XrefRef(xref, not, _) =>
      val tags = DlxConfig.authorityControlled(rt).keys.toSeq
      val hit = exists(col("datafields"), f =>
        f.getField("tag").isin(tags: _*) &&
          exists(f.getField("subfields"), s => s.getField("xref") === xref))
      if (not) !hit else hit

    case LogicalExists(field, not) =>
      val hit = size(coalesce(col("logical").getItem(field), array())) > 0
      if (not) !hit else hit

    case LogicalExact(field, value) =>
      exists(coalesce(col("logical").getItem(field), array()),
        v => normalizeCol(v) === normalize(value))

    case LogicalRx(field, rx, not) =>
      val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
      collectCapped(browseIdx.where(col("field") === field && col("value").rlike(pattern))
          .select("value").distinct()) match {
        case Some(values) if values.isEmpty => lit(false)
        case Some(values) =>
          val hit = exists(coalesce(col("logical").getItem(field), array()),
            v => normalizeCol(v).isin(values.map(normalize): _*))
          if (not) !hit else hit
        case None =>
          // beyond the in-list cap: regex the record's own logical values
          val hit = exists(coalesce(col("logical").getItem(field), array()),
            v => v.rlike(pattern))
          if (not) !hit else hit
      }

    case LogicalText(field, tq, not) =>
      val terms = Tokenizer.tokenize(tq.terms)
      val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
      var entries = browseIdx.where(col("field") === field)
      terms.foreach(t => entries = entries.where(array_contains(col("words"), t)))
      negated.foreach(t => entries = entries.where(!array_contains(col("words"), t)))
      tq.phrases.foreach { p =>
        entries = entries.where(col("text").rlike("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))
      }
      collectCapped(entries.select("value").distinct()) match {
        case Some(values) if values.isEmpty => lit(false)
        case Some(values) =>
          val hit = exists(coalesce(col("logical").getItem(field), array()),
            v => normalizeCol(v).isin(values.map(normalize): _*))
          if (not) !hit else hit
        case None =>
          // beyond the cap: tokenized matching on the record's own
          // logical values (browse-index words = tokenize(scrub(value)))
          val hit = exists(coalesce(col("logical").getItem(field), array()), v => {
            val words = tokenizeUdf(scrubUdf(v))
            val termsOk = terms.map(t => array_contains(words, t))
            val negOk = negated.map(t => !array_contains(words, t))
            val phrasesOk = tq.phrases.map(p =>
              concat(lit(" "), scrubUdf(v), lit(" "))
                .rlike("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))
            (termsOk ++ negOk ++ phrasesOk).reduceOption(_ && _).getOrElse(lit(true))
          })
          if (not) !hit else hit
      }

    case FreeText(tq) =>
      val terms = Tokenizer.tokenize(tq.terms).filterNot(Tokenizer.stopWords.contains)
      val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
      val termCols = terms.map(t => array_contains(col("words"), t))
      val negCols = negated.map(t => !array_contains(col("words"), t))
      val phraseCols = tq.phrases.map { q =>
        val phrase = Tokenizer.scrub(q.stripPrefix("\"").stripSuffix("\""))
        col("text").rlike("\\s" + java.util.regex.Pattern.quote(phrase) + "\\s")
      }
      val starCols = tq.starred.map { st =>
        val pattern = " " + st.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
        col("text").rlike(pattern)
      }
      (termCols ++ negCols ++ phraseCols ++ starCols)
        .reduceOption(_ && _).getOrElse(lit(true))
  }

  /** The xref OR-branch as a Column: an INSET while the resolved set
    * fits, a pending flag join past the cap (any-code scope — the
    * shape every non-FieldCond site uses). */
  private def xrefHitCol(tag: String, xrefs: XrefSet, pnd: Pending): Column = xrefs match {
    case XrefList(xs) => existsField(tag, subMatch(None, xrefIn(xs)))
    case XrefFrame(hits) => pnd.flag(tag, None, hits)
  }

  /** value-in-set / xref OR shape shared by the direct fallbacks. */
  private def directShape(rt: String, tag: String, code: Option[String],
      valueHit: Column, xrefs: XrefSet, not: Boolean, pnd: Pending): Column = {
    val xrefHit = xrefHitCol(tag, xrefs, pnd)
    if (!not) (if (xrefs.nonEmpty) valueHit || xrefHit else valueHit)
    else if (xrefs.nonEmpty) !valueHit && !xrefHit
    else !valueHit
  }

  /** first configured source tag of an authority-controlled tag, if
    * the code scope stays within authority control. */
  private def controlledSourceTag(rt: String, tag: String, code: Option[String]): Option[String] =
    if (DlxConfig.authorityControlled(rt).contains(tag) &&
        code.forall(c => DlxConfig.isAuthorityControlled(rt, tag, c)))
      DlxConfig.authorityControlled(rt).get(tag).map(_.values.head)
    else None

  /** Fallback when a regex condition's resolved in-list exceeds the cap
    * (the reference falls back to a direct regex condition,
    * dlx/marc/query.py:194-206): regex the record's own subfield
    * values. The xref branch resolves through the heading dimension,
    * itself capped at maxResolvedXrefs with the flag-join fallback. */
  private def directRegexPredicate(rt: String, tag: String, code: Option[String],
      rx: Rx, not: Boolean, pnd: Pending): Column = {
    val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
    val valueHit = existsField(tag,
      subMatch(code, literalOnly(s => s.getField("value").rlike(pattern))))
    val xrefs: XrefSet = controlledSourceTag(rt, tag, code) match {
      case None => XrefList(Nil)
      case Some(src) =>
        resolveXrefSet(headings.where(col("tag") === src && col("value").rlike(pattern)))
    }
    directShape(rt, tag, code, valueHit, xrefs, not, pnd)
  }

  /** value-in-set predicate with the auth xref OR branch. */
  private def inSetPredicate(rt: String, tag: String, code: Option[String],
      matched: Seq[String], not: Boolean, pnd: Pending): Column = {
    val valueHit = existsField(tag, subMatch(code, normValueIn(matched)))
    val xrefs: XrefSet =
      if (DlxConfig.authorityControlled(rt).contains(tag) &&
          code.forall(c => DlxConfig.isAuthorityControlled(rt, tag, c)))
        xrefsForValues(rt, tag, matched)
      else XrefList(Nil)
    val xrefHit = xrefHitCol(tag, xrefs, pnd)
    if (!not) (if (xrefs.nonEmpty) valueHit || xrefHit else valueHit)
    else if (xrefs.nonEmpty) !valueHit && !xrefHit
    else !valueHit
  }
}
