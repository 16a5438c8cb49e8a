package graft.spark

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Derived DataFrames over the bibs/auths tables — the Spark-native
  * form of the reference's maintained collections (SURVEY §2.9, §4):
  *
  *  - [[authHeadings]]: the auth-heading dimension; the reference's
  *    Auth caches (dlx/marc/__init__.py:1835-1874) become a broadcast
  *    hash join side. At 100 TB the auths table is still dimension-
  *    sized relative to bibs, so every value resolution is a
  *    broadcast, never a fact-table shuffle.
  *  - [[resolveLinked]]: materializes linked subfield values record-
  *    wide (Auth.lookup per subfield becomes ONE broadcast join).
  *  - [[tagIndex]]: the `_index_<tag>` collections
  *    (dlx/scripts/build_text_collections.py:48-121) as one
  *    DataFrame: explode datafields -> field text -> group by
  *    (tag, text) with collected subfield sets + tokenized words.
  *  - [[browseIndex]]: the `_index_<logical field>` collections
  *    (dlx/scripts/build_logical_fields.py:84-102).
  *
  * All are `DataFrame => DataFrame` pipelines: recompute in batch or
  * incrementally maintain via foreachBatch (graft.streaming).
  */
object MarcContext {

  // Column forms of the tokenizer, backed by the native codegen
  // expressions in TextExprs (no UDF encoder round-trip). Registration
  // is idempotent and happens at Column-construction time against the
  // active session, so every entry point — compiler, index builds,
  // streaming, tests — resolves without an explicit init call.
  // coalesce keeps the historical UDF null semantics ("".../empty).
  private def withRegistered(build: => Column): Column = {
    SparkSession.getActiveSession.foreach(TextExprs.register)
    build
  }

  def scrubUdf(c: Column): Column =
    withRegistered(call_function("dlx_scrub", coalesce(c, lit(""))))

  def tokenizeUdf(c: Column): Column =
    withRegistered(call_function("dlx_tokenize", coalesce(c, lit(""))))

  def registerFunctions(spark: SparkSession): Unit = {
    TextExprs.register(spark)
    CollationNormalizeExpr.register(spark)
    CollationSortKeyExpr.register(spark)
  }

  /** Numeric-aware collation sort key (strength-1 +
    * numericOrdering:true — the reference's default collation): byte
    * order == collation order. Codegen expression when registered,
    * UDF fallback otherwise. */
  def sortKeyCol(c: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if s.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dlx_sort_key")) =>
        call_function("dlx_sort_key", c)
      case _ =>
        val k = udf((s2: String) => if (s2 == null) null else graft.query.Collation.sortKey(s2))
        k(c)
    }
  }

  /** (xref, tag, code, value, norm_value) — one row per subfield of
    * each auth's heading field (first field whose tag starts '1'). */
  def authHeadings(auths: DataFrame): DataFrame = {
    val heading = auths.select(col("_id").as("xref"),
      // first datafield with tag like '1%' — try_element_at so an auth
      // without a 1XX yields null (ANSI-mode safe) instead of throwing
      try_element_at(filter(col("datafields"), f => f.getField("tag").startsWith("1")), lit(1)).as("hf"))
      .where(col("hf").isNotNull)
    heading.select(col("xref"), col("hf.tag").as("tag"),
        explode(col("hf.subfields")).as("sf"))
      .select(col("xref"), col("tag"), col("sf.code").as("code"), col("sf.value").as("value"))
      .where(col("value").isNotNull)
      .withColumn("norm_value", normalizeCol(col("value")))
  }

  /** strength-1 collation shadow: lowercase + strip diacritics
    * (SURVEY §4 collation row). Uses the native codegen expression
    * when the session has it registered, else the UDF fallback. */
  def normalizeCol(c: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) if s.sessionState.functionRegistry
          .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("dlx_normalize")) =>
        call_function("dlx_normalize", c)
      case _ =>
        val norm = udf((s2: String) => if (s2 == null) null else graft.query.Collation.normalize(s2))
        norm(c)
    }
  }

  /** Materialize linked subfield values via ONE broadcast join against
    * the heading dimension (the Spark-shaped Auth.lookup). */
  def resolveLinked(records: DataFrame, auths: DataFrame): DataFrame = {
    val dim = broadcast(authHeadings(auths)
      .select(col("xref").as("h_xref"), col("code").as("h_code"), col("value").as("h_value")))
    val exploded = records.select(col("_id").as("r_id"), posexplode(col("datafields")).as(Seq("fpos", "f")))
      .select(col("r_id"), col("fpos"), col("f.tag").as("tag"), col("f.ind1").as("ind1"),
        col("f.ind2").as("ind2"), posexplode(col("f.subfields")).as(Seq("spos", "s")))
    val resolved = exploded
      .join(dim, exploded("s.xref") === dim("h_xref") && exploded("s.code") === dim("h_code"), "left")
      .select(col("r_id"), col("fpos"), col("tag"), col("ind1"), col("ind2"), col("spos"),
        col("s.code").as("code"),
        coalesce(col("s.value"), col("h_value")).as("value"),
        col("s.xref").as("xref"))
    val fields = resolved
      .groupBy("r_id", "fpos", "tag", "ind1", "ind2")
      .agg(sort_array(collect_list(struct(col("spos"), col("code"), col("value"), col("xref")))).as("subs"))
      .withColumn("subfields", transform(col("subs"),
        s => struct(s.getField("code").as("code"), s.getField("value").as("value"), s.getField("xref").as("xref"))))
      .groupBy("r_id")
      .agg(sort_array(collect_list(struct(col("fpos"), col("tag"), col("ind1"), col("ind2"), col("subfields")))).as("fs"))
      .withColumn("datafields", transform(col("fs"), f => struct(
        f.getField("tag").as("tag"), f.getField("ind1").as("ind1"),
        f.getField("ind2").as("ind2"), f.getField("subfields").as("subfields"))))
      .select(col("r_id"), col("datafields"))
    records.drop("datafields")
      .join(fields, records("_id") === fields("r_id"), "left")
      .drop("r_id")
  }

  /** Broadcast-map variant of [[resolveLinked]]: the heading dimension
    * is collected and broadcast (exactly the reference's
    * Auth.build_cache, dlx/marc/__init__.py:1841-1874), and values
    * materialize in ONE narrow map over the typed rows — no shuffle at
    * all. Preferred while the auth dimension fits executor memory
    * (dlx's own cache assumption); [[resolveLinked]] is the join path
    * for an unbounded dimension. */
  def resolveLinkedBroadcast(records: org.apache.spark.sql.Dataset[MarcRow],
      auths: DataFrame): org.apache.spark.sql.Dataset[MarcRow] = {
    import MarcSchema.marcRowEncoder
    val spark = records.sparkSession
    val dim: Map[(Long, String), String] = authHeadings(auths)
      .select("xref", "code", "value").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
    val bc = spark.sparkContext.broadcast(dim)
    records.map { r =>
      r.copy(datafields = r.datafields.map { f =>
        f.copy(subfields = f.subfields.map { s =>
          if (s.xref != null && s.value == null)
            s.copy(value = bc.value.getOrElse((s.xref.longValue, s.code), null))
          else s
        })
      })
    }
  }

  /** Broadcast-map resolution as a pure Column projection: the heading
    * dimension rides an executor broadcast behind a scalar UDF applied
    * INSIDE the datafields transform — unlike the typed
    * [[resolveLinkedBroadcast]] it never pays the MarcRow encoder
    * round-trip for untouched columns, and unlike [[resolveLinked]] it
    * never shuffles. The fastest path while the dimension fits
    * executor memory. */
  def resolveLinkedMapUdf(records: DataFrame, auths: DataFrame): DataFrame =
    resolveLinkedMapUdf(records,
      authHeadings(auths).select("xref", "code", "value").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap)

  /** [[resolveLinkedMapUdf]] with the heading dimension already
    * collected — lets callers that had to probe the dimension's size
    * anyway reuse that collect instead of scanning it twice. */
  def resolveLinkedMapUdf(records: DataFrame, dim: Map[(Long, String), String]): DataFrame = {
    val spark = records.sparkSession
    val bc = spark.sparkContext.broadcast(dim)
    val lookup = udf((xref: java.lang.Long, code: String) =>
      if (xref == null) null else bc.value.getOrElse((xref.longValue, code), null))
    records.withColumn("datafields",
      transform(col("datafields"), f => struct(
        f.getField("tag").as("tag"),
        f.getField("ind1").as("ind1"),
        f.getField("ind2").as("ind2"),
        transform(f.getField("subfields"), s => struct(
          s.getField("code").as("code"),
          when(s.getField("xref").isNotNull && s.getField("value").isNull,
            lookup(s.getField("xref"), s.getField("code")))
            .otherwise(s.getField("value")).as("value"),
          s.getField("xref").as("xref"))).as("subfields"))))
  }

  /** Auto-select the resolution strategy from the dimension's actual
    * size (the reference's build_cache assumption, made checkable):
    * a heading dimension under `maxBroadcastHeadings` rows resolves
    * via the zero-shuffle broadcast-map projection; a larger one
    * falls back to the broadcast-hash-join path. Callers no longer
    * choose. */
  def resolveLinkedAuto(records: org.apache.spark.sql.Dataset[MarcRow], auths: DataFrame,
      maxBroadcastHeadings: Long = 1L << 20): org.apache.spark.sql.Dataset[MarcRow] = {
    import MarcSchema.marcRowEncoder
    val cols = records.columns
    // size probe and dimension fetch fused into ONE bounded collect:
    // take max+1 rows — if the limit was not hit, the dimension is
    // already in hand for the broadcast map (no second scan); if it
    // was, fall back to the shuffle-free broadcast-hash-join path.
    // Clamp BEFORE the +1: a sentinel Long.MaxValue would wrap the
    // limit negative, and any cap >= Int.MaxValue could mistake a
    // truncated collect for the complete dimension.
    val cap = math.max(0L, math.min(maxBroadcastHeadings, Int.MaxValue - 2L))
    val probe = authHeadings(auths).select("xref", "code", "value")
      .limit(cap.toInt + 1).collect()
    if (probe.length <= cap)
      resolveLinkedMapUdf(records.toDF(),
          probe.map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap)
        .select(cols.map(col): _*).as[MarcRow]
    else
      resolveLinked(records.toDF(), auths).select(cols.map(col): _*).as[MarcRow]
  }

  /** Field-level text of each datafield (resolved values assumed):
    * space-joined subfield values (dlx/marc/__init__.py:921). */
  private def fieldTextCol(f: Column): Column =
    concat_ws(" ", transform(f.getField("subfields"),
      s => coalesce(s.getField("value"), lit(""))))

  /** The `_index_<tag>` family as one DataFrame:
    * (tag, raw text, padded scrubbed text, stemmed words, subfield
    * (code, value) set). Hash-aggregation on (tag, text) — map-side
    * combine, no skew (text keys are near-unique). */
  def tagIndex(recordsResolved: DataFrame): DataFrame = {
    val fields = recordsResolved
      .select(explode(col("datafields")).as("f"))
      .select(col("f.tag").as("tag"), fieldTextCol(col("f")).as("raw"),
        col("f.subfields").as("subfields"))
    fields
      .select(col("tag"), col("raw"), explode(col("subfields")).as("s"))
      .where(col("s.value").isNotNull)
      .groupBy("tag", "raw")
      .agg(collect_set(struct(col("s.code").as("code"), col("s.value").as("value"))).as("subfields"))
      .withColumn("text", concat(lit(" "), scrubUdf(col("raw")), lit(" ")))
      .withColumn("words", array_distinct(tokenizeUdf(col("raw"))))
  }

  /** The `_index_<logical field>` family: (field, value, padded
    * scrubbed text, words, record types). */
  def browseIndex(records: DataFrame): DataFrame =
    records
      .select(col("record_type"), explode(col("logical")).as(Seq("field", "values")))
      .where(col("field") =!= "_record_type")
      .select(col("record_type"), col("field"), explode(col("values")).as("value"))
      .groupBy("field", "value")
      .agg(collect_set(col("record_type")).as("_record_type"))
      .withColumn("text", concat(lit(" "), scrubUdf(col("value")), lit(" ")))
      .withColumn("words", array_distinct(tokenizeUdf(scrubUdf(col("value")))))

  /** Per-xref usage counts across auth-controlled tags
    * (calculate_auth_use, dlx/scripts/build_logical_fields.py:218-252):
    * explode -> explode -> groupBy(xref).count — textbook hash agg. */
  def authUseCounts(records: DataFrame): DataFrame =
    records
      .select(explode(col("datafields")).as("f"))
      .select(explode(col("f.subfields")).as("s"))
      .where(col("s.xref").isNotNull)
      .groupBy(col("s.xref").as("xref"))
      .agg(count(lit(1)).as("use_count"))
}
