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
  * Resolved value sets are small (the reference enforces a 1 MB cap;
  * typical queries match a handful of values), so they become `isin`
  * predicates on normalized columns — the list plays the role of the
  * broadcast side of a semi-join, and Catalyst pushes the whole
  * predicate into the scan. Structural conditions compile to pure
  * higher-order-function expressions (exists/filter over the
  * datafields array) — fully codegen'd, no UDFs on the hot path.
  */
final class SparkQueryCompiler(spark: SparkSession, bibs: DataFrame, auths: DataFrame) {

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

  private def records(recordType: String): DataFrame =
    if (recordType == "auth") auths else bibs

  def run(ast: QueryAst): DataFrame =
    records(ast.recordType).where(compile(ast))

  def run(query: String, recordType: String = "bib"): DataFrame =
    run(QueryParser.parse(query, recordType))

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
          val subs = tagIdxFor(t).select(explode(col("subfields")).as("s"))
            .select(col("s.code").as("c"), col("s.value").as("v"))
          val scoped = c.map(cc => subs.where(col("c") === cc)).getOrElse(subs)
          (t, c, scoped.where(rxFilter(rx)).select(normalizeCol(col("v")).as("mnorm")).distinct())
        case TagText(t, c, tq, _, _) =>
          val terms = Tokenizer.tokenize(tq.terms)
          val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
          var entries = tagIdxFor(t)
          terms.foreach(w => entries = entries.where(array_contains(col("words"), w)))
          negated.foreach(w => entries = entries.where(!array_contains(col("words"), w)))
          tq.phrases.foreach { p =>
            entries = entries.where(col("text").rlike("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))
          }
          val values = entries.select(explode(col("subfields")).as("s"))
            .select(col("s.code").as("c"), col("s.value").as("v"))
          val scoped = c.map(cc => values.where(col("c") === cc)).getOrElse(values)
            .where(col("v").isNotNull && col("v") =!= "")
          // value-level term containment via the tokenizer UDF
          val termsOk = terms.foldLeft(scoped) { (d, w) =>
            d.where(array_contains(tokenizeUdf(col("v")), w))
          }
          (t, c, termsOk.select(normalizeCol(col("v")).as("mnorm")).distinct())
        case other => throw new IllegalStateException(other.toString)
      }
      // records whose tag subfields hit the matched values
      val exploded = df.select(col("_id").as("rid"), explode(col("datafields")).as("f"))
        .where(col("f.tag") === tag)
        .select(col("rid"), explode(col("f.subfields")).as("s"))
      val codeScoped = code.map(c => exploded.where(col("s.code") === c)).getOrElse(exploded)
      val valueHits = codeScoped
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

  def compile(ast: QueryAst): Column =
    ast.conditions.map(compileCond(_, ast.recordType)).reduceOption(_ && _).getOrElse(lit(true))

  // ---- resolution against the derived DataFrames (collect: the value
  // sets are condition-selective, mirroring the reference's in-lists)

  private def normalize(s: String): String = Collation.normalize(s)

  private def rxFilter(rx: Rx): Column = {
    val pattern = if (rx.ci) "(?i)" + rx.pattern else rx.pattern
    col("v").rlike(pattern)
  }

  /** subfield values matched by a regex in the tag index. */
  def resolveTagRegex(tag: String, code: Option[String], rx: Rx): Seq[String] = {
    val subs = tagIdxFor(tag)
      .select(explode(col("subfields")).as("s"))
      .select(col("s.code").as("c"), col("s.value").as("v"))
    val filtered = code.map(c => subs.where(col("c") === c)).getOrElse(subs)
      .where(rxFilter(rx))
    filtered.select("v").distinct().collect().map(_.getString(0)).toSeq
  }

  /** subfield values matched by field-level text search + value-level
    * term containment. */
  def resolveTagText(tag: String, code: Option[String], tq: TextQuery): Seq[String] = {
    val terms = Tokenizer.tokenize(tq.terms)
    val negated = Tokenizer.tokenize(tq.negated.mkString(" "))
    var entries = tagIdxFor(tag)
    terms.foreach(t => entries = entries.where(array_contains(col("words"), t)))
    negated.foreach(t => entries = entries.where(!array_contains(col("words"), t)))
    tq.phrases.foreach { p =>
      entries = entries.where(col("text").rlike("\\b" + java.util.regex.Pattern.quote(p) + "\\b"))
    }
    val values = entries.select(explode(col("subfields")).as("s"))
      .select(col("s.code").as("c"), col("s.value").as("v"))
    val scoped = code.map(c => values.where(col("c") === c)).getOrElse(values)
      .where(col("v").isNotNull && col("v") =!= "")
      .select("v").distinct().collect().map(_.getString(0)).toSeq
    scoped.filter { v =>
      val words = Tokenizer.tokenize(v)
      terms.forall(words.contains)
    }
  }

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

  private def normValueIn(values: Seq[String]): Column => Column =
    s => normalizeCol(s.getField("value")).isin(values.map(normalize): _*)

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
          s => s.getField("code") === code && valuePred(s)
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
      val valueHit = existsField(tag, subMatch(None, valuePred))
      val xrefHit = existsField(tag, subMatch(None, xrefIn(xrefs)))
      if (!not) (if (xrefs.nonEmpty) valueHit || xrefHit else valueHit)
      else !valueHit && !xrefHit

    case TagRegex(tag, code, rx, not, _) =>
      val matched = resolveTagRegex(tag, code, rx)
      if (matched.isEmpty) lit(false)
      else inSetPredicate(rt, tag, code, matched, not)

    case TagText(tag, code, tq, not, _) =>
      val matched = resolveTagText(tag, code, tq)
      if (matched.isEmpty) lit(false)
      else inSetPredicate(rt, tag, code, matched, not)

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
      val values = browseIdx.where(col("field") === field && col("value").rlike(pattern))
        .select("value").distinct().collect().map(_.getString(0)).toSeq
      if (values.isEmpty) lit(false)
      else {
        val hit = exists(coalesce(col("logical").getItem(field), array()),
          v => normalizeCol(v).isin(values.map(normalize): _*))
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
      val values = entries.select("value").distinct().collect().map(_.getString(0)).toSeq
      if (values.isEmpty) lit(false)
      else {
        val hit = exists(coalesce(col("logical").getItem(field), array()),
          v => normalizeCol(v).isin(values.map(normalize): _*))
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
