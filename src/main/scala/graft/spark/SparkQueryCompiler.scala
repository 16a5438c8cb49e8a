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
  *    capped at the reference's limit (dlx/marc/query.py:194-199);
  *    past the cap they degrade to a direct predicate over the
  *    record's own values, exactly as the reference degrades to a raw
  *    regex condition.
  * Structural conditions compile to pure higher-order-function
  * expressions (exists/filter over the datafields array) — fully
  * codegen'd, no UDFs on the hot path.
  */
final class SparkQueryCompiler(spark: SparkSession, bibs: DataFrame, auths: DataFrame,
    maxResolvedValues: Int = 10000, maxResolvedBytes: Int = 1 << 20) {

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
    records(ast.recordType).where(compile(ast))

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
    if (rest.nonEmpty) df = df.where(rest.map(compileCond(_, rt)).reduce(_ && _))

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

  def compile(ast: QueryAst): Column =
    ast.conditions.map(compileCond(_, ast.recordType)).reduceOption(_ && _).getOrElse(lit(true))

  // ---- resolution against the derived DataFrames. Collected in-lists
  // are capped at the reference's limit (dlx/marc/query.py:194-199:
  // 1 MB serialized); past the cap the caller falls back to a direct
  // predicate over the record — same degradation the reference applies.

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
  private def authXrefs(rt: String, tag: String, code: String, value: Either[String, Rx]): Seq[Long] = {
    DlxConfig.authoritySourceTag(rt, tag, code) match {
      case None => Nil
      case Some(src) =>
        val base = headings.where(col("tag") === src && col("code") === code)
        val hit = value match {
          case Left(s) => base.where(col("norm_value") === normalize(s))
          case Right(rx) => base.where({
            val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
            col("value").rlike(pattern)
          })
        }
        hit.select("xref").distinct().collect().map(_.getLong(0)).toSeq
    }
  }

  /** auth ids whose FIRST source tag of `tag` has any subfield value in
    * the set (TagOnly/TagText resolution, dlx/marc/query.py:210-228). */
  private def xrefsForValues(rt: String, tag: String, values: Seq[String]): Seq[Long] =
    DlxConfig.authorityControlled(rt).get(tag).map(_.values.head) match {
      case None => Nil
      case Some(src) =>
        headings.where(col("tag") === src &&
          col("norm_value").isin(values.map(normalize): _*))
          .select("xref").distinct().collect().map(_.getLong(0)).toSeq
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

  def compileCond(cond: Cond, rt: String): Column = cond match {
    case AndCond(cs) => cs.map(compileCond(_, rt)).reduce(_ && _)
    case OrCond(cs) => cs.map(compileCond(_, rt)).reduce(_ || _)
    case MatchNothing => lit(false)

    case FieldCond(tag, subs, modifier, _) =>
      def pairPred(code: String, cv: CondVal): Column => Column = {
        if (DlxConfig.isAuthorityControlled(rt, tag, code)) {
          val xrefs = cv match {
            case Exact(s) => authXrefs(rt, tag, code, Left(s))
            case TextMode(s) => authXrefs(rt, tag, code, Left(s))
            case rx: Rx => authXrefs(rt, tag, code, Right(rx))
            case Star => Nil
          }
          s => s.getField("code") === code && xrefIn(xrefs)(s)
        } else {
          val valuePred: Column => Column = cv match {
            case Exact(v) => s => normalizeCol(s.getField("value")) === normalize(v)
            case TextMode(v) => s => normalizeCol(s.getField("value")) === normalize(v)
            case rx: Rx =>
              val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
              s => s.getField("value").rlike(pattern)
            case Star => _ => lit(true)
          }
          s => s.getField("code") === code && literalOnly(valuePred)(s)
        }
      }
      val preds = subs.map { case (c, v) => pairPred(c, v) }
      modifier match {
        case None =>
          preds.map(p => existsField(tag, f => exists(f.getField("subfields"), p))).reduce(_ && _)
        case Some("not") =>
          !existsField(tag, f => preds.map(p => exists(f.getField("subfields"), p)).reduce(_ && _))
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
      val xrefs: Seq[Long] = cv match {
        case Exact(v) => xrefsForValues(rt, tag, Seq(v))
        case TextMode(v) => xrefsForValues(rt, tag, Seq(v))
        case rx: Rx =>
          DlxConfig.authorityControlled(rt).get(tag).map(_.values.head) match {
            case None => Nil
            case Some(src) =>
              val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
              headings.where(col("tag") === src && col("value").rlike(pattern))
                .select("xref").distinct().collect().map(_.getLong(0)).toSeq
          }
        case Star => Nil
      }
      val valueHit = existsField(tag, subMatch(None, literalOnly(valuePred)))
      val xrefHit = existsField(tag, subMatch(None, xrefIn(xrefs)))
      if (!not) (if (xrefs.nonEmpty) valueHit || xrefHit else valueHit)
      else !valueHit && !xrefHit

    case TagRegex(tag, code, rx, not, _) =>
      resolveTagRegex(tag, code, rx) match {
        // reference quirk: zero matches = match-nothing, even under NOT
        case Some(matched) if matched.isEmpty => lit(false)
        case Some(matched) => inSetPredicate(rt, tag, code, matched, not)
        case None => directRegexPredicate(rt, tag, code, rx, not)
      }

    case TagText(tag, code, tq, not, _) =>
      resolveTagText(tag, code, tq) match {
        case Some(matched) if matched.isEmpty => lit(false)
        case Some(matched) => inSetPredicate(rt, tag, code, matched, not)
        case None => directTextPredicate(rt, tag, code, tq, not)
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

  /** value-in-set / xref OR shape shared by the direct fallbacks. */
  private def directShape(rt: String, tag: String, code: Option[String],
      valueHit: Column, xrefs: Seq[Long], not: Boolean): Column = {
    val xrefHit = existsField(tag, subMatch(None, xrefIn(xrefs)))
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
    * values. The xref branch still resolves through the heading
    * dimension — dimension-bounded by design (SCALING.md). */
  private def directRegexPredicate(rt: String, tag: String, code: Option[String],
      rx: Rx, not: Boolean): Column = {
    val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
    val valueHit = existsField(tag,
      subMatch(code, literalOnly(s => s.getField("value").rlike(pattern))))
    val xrefs: Seq[Long] = controlledSourceTag(rt, tag, code) match {
      case None => Nil
      case Some(src) =>
        headings.where(col("tag") === src && col("value").rlike(pattern))
          .select("xref").distinct().collect().map(_.getLong(0)).toSeq
    }
    directShape(rt, tag, code, valueHit, xrefs, not)
  }

  /** Fallback when a text condition's resolved in-list exceeds the cap:
    * evaluate field-level term/negation/phrase constraints and
    * value-level term containment against the record's own fields
    * (the per-record form of the tag-index entry tests). */
  private def directTextPredicate(rt: String, tag: String, code: Option[String],
      tq: TextQuery, not: Boolean): Column = {
    val terms = Tokenizer.tokenize(tq.terms)
    val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
    def fieldTextCol(f: Column): Column =
      concat_ws(" ", transform(f.getField("subfields"),
        s => coalesce(s.getField("value"), lit(""))))
    val fieldPred: Column => Column = f => {
      val words = tokenizeUdf(fieldTextCol(f))
      val termsOk = terms.map(t => array_contains(words, t))
      val negOk = negated.map(t => !array_contains(words, t))
      val phrasesOk = tq.phrases.map(p =>
        concat(lit(" "), scrubUdf(fieldTextCol(f)), lit(" "))
          .rlike("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))
      val valueOk = exists(f.getField("subfields"), s =>
        code.map(c => s.getField("code") === c).getOrElse(lit(true)) &&
          s.getField("xref").isNull &&
          terms.map(t => array_contains(tokenizeUdf(s.getField("value")), t))
            .reduceOption(_ && _).getOrElse(lit(true)))
      (termsOk ++ negOk ++ phrasesOk :+ valueOk).reduce(_ && _)
    }
    val valueHit = existsField(tag, fieldPred)
    val xrefs: Seq[Long] = controlledSourceTag(rt, tag, code) match {
      case None => Nil
      case Some(src) =>
        var h = headings.where(col("tag") === src)
        terms.foreach(t => h = h.where(array_contains(tokenizeUdf(col("value")), t)))
        negated.foreach(t => h = h.where(!array_contains(tokenizeUdf(col("value")), t)))
        h.select("xref").distinct().collect().map(_.getLong(0)).toSeq
    }
    directShape(rt, tag, code, valueHit, xrefs, not)
  }

  /** value-in-set predicate with the auth xref OR branch. */
  private def inSetPredicate(rt: String, tag: String, code: Option[String],
      matched: Seq[String], not: Boolean): Column = {
    val valueHit = existsField(tag, subMatch(code, normValueIn(matched)))
    val xrefs =
      if (DlxConfig.authorityControlled(rt).contains(tag) &&
          code.forall(c => DlxConfig.isAuthorityControlled(rt, tag, c)))
        xrefsForValues(rt, tag, matched)
      else Nil
    val xrefHit = existsField(tag, subMatch(None, xrefIn(xrefs)))
    if (!not) (if (xrefs.nonEmpty) valueHit || xrefHit else valueHit)
    else if (xrefs.nonEmpty) !valueHit && !xrefHit
    else !valueHit
  }
}
