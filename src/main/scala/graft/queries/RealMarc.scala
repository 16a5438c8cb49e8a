package graft.queries

import graft.spark.{AuthOps, LogicalFields, MarcContext, SparkQueryCompiler}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Realistic-MARC gates (round-9 verdict #7): the query-DSL / browse /
  * auth-resolution family re-gated on a heading dimension with
  * realistic statistics, generated cross-engine with the [[RealCorpus]]
  * LCG discipline.
  *
  * Why: every MARC gate so far derives its auth dimension from TPC-H
  * `part` names — ~90 distinct words, uniform usage, no skew. A real
  * authority file is the opposite: a Zipfian vocabulary (a few
  * head subjects on hundreds of thousands of records, a long tail used
  * once) and heavily skewed attachment. Selectivity-sensitive plans —
  * the semi-join text path, the browse-index in-list cap, the
  * broadcast-vs-join auth resolve, the cascade touching one head
  * auth's attached set — are only honestly exercised against that
  * shape (the same argument that produced q174–q185 for the text and
  * vector families).
  *
  * Corpus (both engines generate it independently from MINSTD-LCG
  * integer arithmetic — no parquet hand-off, no engine hash):
  *  - `real_auths`: 3,000 auths, heading 150$a = three tokens from the
  *    RealCorpus tier mixture (35% head/40, 35% mid/1,960,
  *    30% tail/17,999) — ~20k-token vocabulary, near-distinct headings
  *    with occasional realistic collisions;
  *  - `real_bibs`: 15,000 bibs, 245$a = two mixture tokens, one 650$a
  *    xref drawn with tiered skew: 50% of bibs attach to the 20 head
  *    auths (~375 bibs each), 30% to 580 mid auths, 20% to 2,400 tail
  *    auths (~1 bib each) — the attachment spectrum a cascade or
  *    auth-use aggregation sees in production.
  *
  * Gates (each twins a green synthetic gate on the realistic shape):
  *  - q187 ← q25: DSL exact heading match (collation, via the heading
  *    dimension → xref in-list) AND a 245 regex (semi-join path);
  *  - q188 ← q80: logical-field regex search through the browse index
  *    at realistic value selectivity;
  *  - q189 ← q26: linked-value resolution over the skewed attachment;
  *  - q190 ← q51: typeahead partial_lookup on the Zipfian dimension;
  *  - q191 ← q62/q37: heading-structure cascade (650→651) on a HEAD
  *    auth — ~375 attached bibs rewritten in one narrow transform —
  *    plus linked-value refresh against the changed dimension;
  *  - q192 ← q30: auth-use counts reproducing the attachment spectrum
  *    (the skew itself is the asserted output).
  */
object RealMarc {

  val nAuths = 3000L
  val nBibs = 15000L

  // ---- shared cross-engine generator ------------------------------------

  /** The MINSTD chain is purely multiplicative, so a draw is LINEAR in
    * the (id, position) seed: the position-to-position increment
    * A³·10007 mod tier-size is CONSTANT across ids, which collapsed a
    * 3-token heading to effectively ONE draw — 168 whole-triple
    * collision classes over 3,000 auths, in arithmetic chains like
    * "w5 w1 w37"/"w6 w2 w38" (random expectation: 0.14 collisions).
    * Seeding each position with the QUADRATIC (id + i)² makes the
    * cross-position offset (C₂−C₁)(2·id + C₁+C₂) id-dependent,
    * restoring independent draws while staying engine-portable 64-bit
    * arithmetic: id ≤ 15,300 keeps (id+i)²·1000003 ≤ 2.4e14 ≪ 2^63 in
    * both engines. Measured after the fix: 2,999 distinct headings
    * (one realistic collision pair). */
  private def mixed(doc: String, i: Int): String =
    s"((($doc) + $i) * (($doc) + $i))"

  /** Heading token positions 101-103, title 201-202: decorrelated from
    * RealCorpus's document stream (which draws positions 1..len). */
  private def headingSql(doc: String, strT: String): String =
    Seq(101, 102, 103).map(i =>
      s"'w' || CAST(${RealCorpus.rankExpr(mixed(doc, i), i.toString)} AS $strT)")
      .mkString(" || ' ' || ")

  private def titleSql(doc: String, strT: String): String =
    Seq(201, 202).map(i =>
      s"'w' || CAST(${RealCorpus.rankExpr(mixed(doc, i), i.toString)} AS $strT)")
      .mkString(" || ' ' || ")

  /** Tiered-skew xref: 50% head (20 auths), 30% mid (580), 20% tail
    * (nA − 600) — all ids < nA so every bib resolves. */
  private def xrefSql(doc: String, nA: Long): String = {
    val t = RealCorpus.rnd(mixed(doc, 301), "0", 8)
    val r2 = RealCorpus.rnd(mixed(doc, 302), "1", 9)
    s"(CASE WHEN ($t % 1000) < 500 THEN ($r2 % 20) " +
      s"WHEN ($t % 1000) < 800 THEN 20 + ($r2 % 580) " +
      s"ELSE 600 + ($r2 % ${nA - 600}) END)"
  }

  private def authsSelect(rangeSrc: String, strT: String): String =
    s"""SELECT auth_id, ${headingSql("auth_id", strT)} AS heading
       |FROM ($rangeSrc) ids""".stripMargin

  /** `nA` parametrizes the tail tier so xref stays < nA at any corpus
    * scale (RealMarcBench runs x10/x30); head/mid tier SIZES stay
    * fixed, so scaling the corpus DEEPENS the skew (head auths carry
    * 10x/30x more bibs) — the production shape, not a rescaled
    * uniform. id ≤ 2e6 keeps (id+i)²·1000003 < 2^63. */
  private def bibsSelect(rangeSrc: String, strT: String, nA: Long): String =
    s"""SELECT bib_id, ${titleSql("bib_id", strT)} AS title,
       |  ${xrefSql("bib_id", nA)} AS xref
       |FROM ($rangeSrc) ids""".stripMargin

  def sparkAuthsSqlN(nA: Long): String = {
    require(nA <= 2000000L, "quadratic seed bound")
    authsSelect(s"SELECT id AS auth_id FROM range(0, $nA)", "STRING")
  }
  def sparkBibsSqlN(nA: Long, nB: Long): String = {
    require(nB <= 2000000L, "quadratic seed bound")
    bibsSelect(s"SELECT id AS bib_id FROM range(0, $nB)", "STRING", nA)
  }
  def sparkAuthsSql: String = sparkAuthsSqlN(nAuths)
  def sparkBibsSql: String = sparkBibsSqlN(nAuths, nBibs)
  def duckAuthsSql: String =
    authsSelect(s"SELECT range AS auth_id FROM range(0, $nAuths)", "VARCHAR")
  def duckBibsSql: String =
    bibsSelect(s"SELECT range AS bib_id FROM range(0, $nBibs)", "VARCHAR", nAuths)

  // ---- Scala replica of the generator arithmetic (for query literals
  // and the spec's corpus pins; RealMarcSpec proves it equals the SQL)

  private val M = 2147483647L
  private val A = 48271L
  private def rndL(doc: Long, i: Long, salt: Long): Long = {
    val seed = (doc * 1000003L + i * 10007L + salt * 7919L) % M
    (A * ((A * seed) % M)) % M
  }
  private[queries] def rankL(doc: Long, i: Long): Long = {
    val r = rndL(doc, i, 3)
    val r2 = (A * r) % M
    if (r % 1000 < 350) 1 + r2 % 40
    else if (r % 1000 < 700) 41 + r2 % 1960
    else 2001 + r2 % 17999
  }
  /** The generated heading of one auth — used to build the q187 exact
    * query literal without reading the corpus. */
  def headingOf(authId: Long): String =
    Seq(101L, 102L, 103L)
      .map(i => s"w${rankL((authId + i) * (authId + i), i)}").mkString(" ")

  /** q187's target: a HEAD-attachment auth (ids 0-19 carry ~375 bibs
    * each), searched in UPPERCASE so the strength-1 collation match is
    * exercised, not just string equality. */
  val targetAuth = 7L

  // ---- MarcRow corpora ---------------------------------------------------

  import MarcOps.{field, sub}

  private def nullCols: Seq[Column] = Seq(
    lit(null).cast("timestamp").as("created"),
    lit(null).cast("timestamp").as("updated"),
    lit(null).cast("string").as("created_user"),
    lit(null).cast("string").as("user"),
    lit(null).cast("string").as("basket"),
    lit("").as("leader"),
    array().cast("array<struct<tag:string,value:string>>").as("controlfields"))

  private def tailCols: Seq[Column] = Seq(
    lit(null).cast("string").as("text"),
    lit(null).cast("array<string>").as("words"),
    lit(null).cast("map<string,array<string>>").as("logical"))

  def authsRel(s: SparkSession): DataFrame = s.sql(sparkAuthsSql)
  def bibsRel(s: SparkSession): DataFrame = s.sql(sparkBibsSql)
  def authsRelN(s: SparkSession, nA: Long): DataFrame = s.sql(sparkAuthsSqlN(nA))
  def bibsRelN(s: SparkSession, nA: Long, nB: Long): DataFrame =
    s.sql(sparkBibsSqlN(nA, nB))

  /** Auth dimension as MarcRows; `changed` swaps the target auth's
    * heading (value AND tag 150→151) for the cascade gate. */
  def marcAuths(s: SparkSession, changed: Boolean = false): DataFrame =
    marcAuthsFrom(authsRel(s), changed)

  def marcAuthsFrom(rel: DataFrame, changed: Boolean = false): DataFrame = {
    val headingVal =
      if (changed) when(col("auth_id") === targetAuth, lit(changedHeading))
        .otherwise(col("heading"))
      else col("heading")
    val headingTag =
      if (changed) when(col("auth_id") === targetAuth, lit("151")).otherwise(lit("150"))
      else lit("150")
    rel.select(
      (lit("auth").as("record_type") +: col("auth_id").cast("long").as("_id") +:
        nullCols :+
        array(struct(headingTag.as("tag"), lit(" ").as("ind1"), lit(" ").as("ind2"),
          array(struct(lit("a").as("code"), headingVal.as("value"),
            lit(null).cast("long").as("xref"))).as("subfields"))).as("datafields")) ++
        tailCols: _*)
  }

  /** Bib corpus with the linked 650$a materialized (value + xref) —
    * the committed-store shape every search gate reads. */
  def marcBibs(s: SparkSession): DataFrame =
    marcBibsFrom(bibsRel(s), authsRel(s))

  def marcBibsFrom(bibsR: DataFrame, authsR: DataFrame): DataFrame =
    bibsR
      .join(authsR.withColumnRenamed("auth_id", "a_id"),
        col("xref") === col("a_id"))
      .select(
        (lit("bib").as("record_type") +: col("bib_id").cast("long").as("_id") +:
          nullCols :+
          array(
            field("245", sub("a", col("title"))),
            field("650", sub("a", col("heading"), col("xref")))).as("datafields")) ++
          tailCols: _*)

  /** Bib corpus with linked values stripped (xref only) — what a raw
    * store read looks like before resolution (q189's input). */
  def marcBibsStripped(s: SparkSession): DataFrame =
    marcBibsStrippedFrom(bibsRel(s))

  def marcBibsStrippedFrom(bibsR: DataFrame): DataFrame =
    bibsR.select(
      (lit("bib").as("record_type") +: col("bib_id").cast("long").as("_id") +:
        nullCols :+
        array(
          field("245", sub("a", col("title"))),
          field("650", sub("a", lit(null).cast("string"), col("xref")))).as("datafields")) ++
        tailCols: _*)

  val changedHeading = "changed w7777 heading"

  // ---- gates --------------------------------------------------------------

  private def firstVal(tag: String): Column =
    try_element_at(flatten(transform(
      filter(col("datafields"), f => f.getField("tag") === tag),
      f => transform(filter(f.getField("subfields"), sf => sf.getField("code") === "a"),
        sf => sf.getField("value")))), lit(1))

  /** q25 twin: exact heading match (UPPERCASE literal → collation
    * normalize → heading-dimension xref in-list) AND a 245 regex that
    * rides the semi-join path — compound DSL at realistic
    * selectivities (~375 attached × ~13% title-prefix hit). */
  def q187RealMarcDsl(s: SparkSession, dir: String): DataFrame = {
    val bibs = marcBibs(s)
    val compiler = new SparkQueryCompiler(s, bibs, marcAuths(s))
    compiler.run(s"650__a:'${headingOf(targetAuth).toUpperCase}' AND 245__a:/^w3/")
      .select("_id").orderBy("_id")
  }

  /** q80 twin: logical-field regex through the browse index — 'w44'
    * hits ~30 of ~3,000 distinct headings (in-list resolution at a
    * realistic cap margin), matched back against each record's own
    * logical values. */
  def q188RealBrowse(s: SparkSession, dir: String): DataFrame = {
    val compiler = new SparkQueryCompiler(s,
      subjectField(marcBibs(s), "bib"), subjectField(marcAuths(s), "auth"))
    compiler.run("subject:/w44/").select("_id").orderBy("_id")
  }

  /** q26 twin: linked-value resolution over the skewed attachment —
    * the head auths' headings fan out to ~375 bibs each through the
    * size-auto broadcast path. */
  def q189RealAuthResolve(s: SparkSession, dir: String): DataFrame = {
    import graft.spark.MarcSchema.marcRowEncoder
    val resolved = MarcContext.resolveLinkedAuto(
      marcBibsStripped(s).as[graft.spark.MarcRow](marcRowEncoder), marcAuths(s)).toDF()
    resolved.select(col("_id"), firstVal("650").as("subject"))
      .where(col("subject").isNotNull)
      .orderBy("_id")
  }

  /** q51 twin: typeahead containment over the Zipfian dimension,
    * bounded (value, xref) order. */
  def q190RealPartialLookup(s: SparkSession, dir: String): DataFrame =
    AuthOps.partialLookup(marcAuths(s), "bib", "650", "a", "w44")
      .orderBy("value", "xref")

  /** q62/q37 twin: heading-STRUCTURE cascade on a head auth — tag
    * 150→151 propagates 650→651 on the ~375 attached bibs (2.5% of the
    * corpus through ONE dimension row: the production skew case) —
    * then linked values refresh against the changed dimension. */
  def q191RealCascade(s: SparkSession, dir: String): DataFrame = {
    val cascaded = AuthOps.cascadeHeadingChange(marcBibs(s), targetAuth,
      "150", Seq("a"), "151", Seq("a"))
    val refreshed = AuthOps.refreshLinkedValues(cascaded, marcAuths(s, changed = true))
    val subjTag = try_element_at(transform(
      filter(col("datafields"), f => f.getField("tag").isin("650", "651")),
      f => f.getField("tag")), lit(1))
    val subjVal = try_element_at(flatten(transform(
      filter(col("datafields"), f => f.getField("tag").isin("650", "651")),
      f => transform(filter(f.getField("subfields"), sf => sf.getField("code") === "a"),
        sf => sf.getField("value")))), lit(1))
    refreshed.select(col("_id"), subjTag.as("subject_tag"), subjVal.as("subject"))
      .orderBy("_id")
  }

  /** q30 twin: auth-use counts — the gate output IS the attachment
    * spectrum (head ~375, tail ~1), hash-checked against the oracle's
    * replay of the same tiered draw. */
  def q192RealAuthUse(s: SparkSession, dir: String): DataFrame =
    MarcContext.authUseCounts(marcBibs(s)).orderBy("xref")

  // ---- over-cap degradation gates ---------------------------------------
  // At 100 TB the resolved value sets EXCEED the reference's in-list
  // cap (dlx/marc/query.py:194-199) routinely. The reference's split:
  // REGEX conditions degrade to a direct predicate over the record's
  // own values (query.py:194-206); TEXT conditions RAISE
  // InvalidQueryString (query.py:313-318) — both paths gated here.
  // Resolved XREF lists (which the reference collects uncapped,
  // query.py:340-358) are capped at maxResolvedXrefs with a
  // distributed flag-join fallback — q197/q198 force that cap low.
  // Forcing a cap low makes the degradation deterministic at gate
  // scale; the oracle is the SAME relational answer, so each gate is
  // exactly "the degraded plan equals the primary path".

  private[graft] def subjectField(df: DataFrame, rt: String): DataFrame = {
    val spec = graft.config.DlxConfig.logicalFields(rt).toMap.apply("subject")
    df.withColumn("logical",
      map(lit("subject"), LogicalFields.fieldValues("subject", spec)))
  }

  /** q188's query through the browse-index OVER-CAP fallback
    * (SparkQueryCompiler LogicalRx None branch: regex the record's own
    * logical values) — must produce exactly q188's rows. */
  def q193RealBrowseFallback(s: SparkSession, dir: String): DataFrame = {
    val compiler = new SparkQueryCompiler(s,
      subjectField(marcBibs(s), "bib"), subjectField(marcAuths(s), "auth"),
      maxResolvedValues = 10)
    compiler.run("subject:/w44/").select("_id").orderBy("_id")
  }

  /** Negated regex through the over-cap fallback (directRegexPredicate
    * not=true): keep bibs whose title does NOT start with a w3-prefix
    * token. The positive twin is q187's regex leg. */
  def q194RealNotRegexFallback(s: SparkSession, dir: String): DataFrame = {
    val compiler = new SparkQueryCompiler(s, marcBibs(s), marcAuths(s),
      maxResolvedValues = 10)
    compiler.run("650__a:* AND NOT 245__a:/^w3/").select("_id").orderBy("_id")
  }

  /** Over-cap fielded TEXT must RAISE, not silently degrade — the
    * reference raises InvalidQueryString ("too many hits ... Try
    * narrowing", dlx/marc/query.py:313-318; the silent fallback is
    * regex-only). The gate proves both halves: the capped compiler
    * raises on the negated text leg (a `require`, so a silent result
    * turns the gate red), and the same query under the default cap
    * returns the primary-path rows the oracle checks. */
  def q195RealTextOvercapRaise(s: SparkSession, dir: String): DataFrame = {
    val capped = new SparkQueryCompiler(s, marcBibs(s), marcAuths(s),
      maxResolvedValues = 10)
    val raised =
      try { capped.run("650__a:* AND NOT 245__a:w3"); false }
      catch { case _: graft.query.InvalidQueryString => true }
    require(raised,
      "over-cap text resolution must raise InvalidQueryString (dlx/marc/query.py:313-318)")
    val full = new SparkQueryCompiler(s, marcBibs(s), marcAuths(s))
    full.run("650__a:* AND NOT 245__a:w3").select("_id").orderBy("_id")
  }

  /** Over-cap XREF in-list (round-9 verdict #1): nested in an OR, the
    * 650$a regex must compile to a Column predicate (the semi-join
    * path only takes top-level positive conditions), so its ~30
    * resolved heading xrefs normally become a driver INSET. Forcing
    * maxResolvedXrefs below that makes the compiler keep the matching
    * heading slice as a DataFrame and evaluate membership as a
    * distributed flag join composed INSIDE the OR — no driver INSET,
    * same answer as the in-list path. */
  def q197RealXrefOvercap(s: SparkSession, dir: String): DataFrame = {
    val compiler = new SparkQueryCompiler(s, marcBibs(s), marcAuths(s),
      maxResolvedXrefs = 5)
    compiler.run("245__a:/^w3/ OR 650__a:/w44/").select("_id").orderBy("_id")
  }

  /** The over-cap xref flag join under NEGATION and collation
    * (TagValue not=true): cap 0 forces even the single-xref exact
    * heading through the flag-join branch, and the NOT must read the
    * flag's complement — bibs NOT attached to the matched auth. */
  def q198RealXrefOvercapNot(s: SparkSession, dir: String): DataFrame = {
    val compiler = new SparkQueryCompiler(s, marcBibs(s), marcAuths(s),
      maxResolvedXrefs = 0)
    compiler.run(s"NOT 650:'${headingOf(targetAuth).toUpperCase}'")
      .select("_id").orderBy("_id")
  }

  /** q62 twin — the STORE-level cascade under realistic skew: q191
    * gates the AuthOps transform, but production cascades run inside
    * MarcStore.commit (auth validation, history versioning, linked
    * refresh on the touched buckets). q62's corpus attaches EVERY bib
    * to one auth, so "cascade" there means "rewrite the whole table";
    * here the changed head auth touches only its ~2% attached slice
    * and the gate asserts exactly that: attached bibs get the new
    * heading AND a second history version, unattached bibs keep
    * version 1 — the touched-bucket write path under skew. */
  // q196 replays 3 commits to build its store; cache it per session
  // (the StoreOps.lifecycleStore discipline) so Verify + specs +
  // repeated bench reps don't rebuild it, and delete the temp tree on
  // JVM exit so gate runs don't accrete /tmp dirs (ADVICE r9)
  // keyed by the CALLER'S session (ADVICE r10): a constant key would
  // capture the first session and hand a later/restarted session a
  // store bound to a stopped one
  private val cascadeStoreCache =
    scala.collection.concurrent.TrieMap.empty[SparkSession, graft.store.MarcStore]

  private def cascadeStore(s: SparkSession): graft.store.MarcStore =
    cascadeStoreCache.getOrElseUpdate(s, {
      import graft.spark.MarcSchema.marcRowEncoder
      val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2021-01-01T00:00:00Z"))
      val t2 = java.sql.Timestamp.from(java.time.Instant.parse("2021-02-01T00:00:00Z"))
      val t3 = java.sql.Timestamp.from(java.time.Instant.parse("2021-03-01T00:00:00Z"))
      val baseDir = graft.store.SwapJournal.scratchDir("graft_q196")
      val store = new graft.store.MarcStore(s, baseDir.toString,
        numBuckets = StoreOps.gateBuckets)
      store.commit(marcAuths(s).as[graft.spark.MarcRow](marcRowEncoder),
        user = "alice", now = t1)
      // every 5th bib (3,000): the store pays per-touched-bucket, and
      // the skewed attachment survives subsetting (head ~75 each)
      val bibs = marcBibsStrippedFrom(bibsRel(s).where(col("bib_id") % 5 === 0))
      store.commit(bibs.as[graft.spark.MarcRow](marcRowEncoder), user = "bob", now = t2)
      // heading VALUE change on the head auth -> cascade on commit
      val changed = marcAuthsFrom(authsRel(s).where(col("auth_id") === targetAuth))
        .withColumn("datafields",
          transform(col("datafields"), f => struct(
            f.getField("tag").as("tag"), f.getField("ind1").as("ind1"),
            f.getField("ind2").as("ind2"),
            transform(f.getField("subfields"), sf => struct(
              sf.getField("code").as("code"),
              lit(changedHeading).as("value"),
              sf.getField("xref").as("xref"))).as("subfields"))))
      store.commit(changed.as[graft.spark.MarcRow](marcRowEncoder),
        user = "editor", now = t3)
      store
    })

  /** q201 (round-11 verdict #1): BULK re-heading through the store
    * write path with the cascade's driver cap FORCED LOW. One commit
    * changes EVERY auth's heading (value suffix on all 3,000; heading
    * tag 150→151 on the lower half) — a vocabulary-migration batch.
    * With maxChangedAuths = 10 the commit must take the over-cap
    * DISTRIBUTED cascade: attach scan by flag join (no changed-id
    * INSET), update-log rows by join, struct changes joined per bib —
    * and produce exactly the state the under-cap path (q196/q62) would:
    * every attached bib re-tagged where its auth's tag moved, linked
    * values refreshed, one extra history version. The oracle replays
    * the migration relationally. */
  private val bulkStoreCache =
    scala.collection.concurrent.TrieMap.empty[SparkSession, graft.store.MarcStore]

  private[graft] def bulkCascadeStore(s: SparkSession): graft.store.MarcStore =
    bulkStoreCache.getOrElseUpdate(s, {
      import graft.spark.MarcSchema.marcRowEncoder
      val t1 = java.sql.Timestamp.from(java.time.Instant.parse("2022-01-01T00:00:00Z"))
      val t2 = java.sql.Timestamp.from(java.time.Instant.parse("2022-02-01T00:00:00Z"))
      val t3 = java.sql.Timestamp.from(java.time.Instant.parse("2022-03-01T00:00:00Z"))
      val baseDir = graft.store.SwapJournal.scratchDir("graft_q201")
      val store = new graft.store.MarcStore(s, baseDir.toString,
        numBuckets = StoreOps.gateBuckets, maxChangedAuths = 10)
      store.commit(marcAuths(s).as[graft.spark.MarcRow](marcRowEncoder),
        user = "alice", now = t1)
      val bibs = marcBibsStrippedFrom(bibsRel(s).where(col("bib_id") % 5 === 0))
      store.commit(bibs.as[graft.spark.MarcRow](marcRowEncoder), user = "bob", now = t2)
      // the migration batch: every heading value gains " v2"; auths
      // below 1500 also move 150 -> 151 (struct change -> bib retag)
      val migrated = marcAuthsFrom(
          authsRel(s).withColumn("heading", concat(col("heading"), lit(" v2"))))
        .withColumn("datafields", transform(col("datafields"), f => struct(
          when(col("_id") < 1500, lit("151")).otherwise(f.getField("tag")).as("tag"),
          f.getField("ind1").as("ind1"), f.getField("ind2").as("ind2"),
          f.getField("subfields").as("subfields"))))
      store.commit(migrated.as[graft.spark.MarcRow](marcRowEncoder),
        user = "migrator", now = t3)
      store
    })

  def q201BulkRecascade(s: SparkSession, dir: String): DataFrame = {
    val store = bulkCascadeStore(s)
    val counts = store.readHistory("bib").groupBy(col("_id").as("c_id"))
      .agg(count(lit(1)).as("n_versions"))
    val resolved = MarcContext.resolveLinkedAuto(
      store.read("bib"), store.read("auth").toDF()).toDF()
    val subjTag = try_element_at(transform(
      filter(col("datafields"), f => f.getField("tag").isin("650", "651")),
      f => f.getField("tag")), lit(1))
    val subjVal = try_element_at(flatten(transform(
      filter(col("datafields"), f => f.getField("tag").isin("650", "651")),
      f => transform(filter(f.getField("subfields"), sf => sf.getField("code") === "a"),
        sf => sf.getField("value")))), lit(1))
    resolved.select(col("_id"), subjTag.as("subject_tag"), subjVal.as("subject"))
      .join(counts, col("_id") === col("c_id")).drop("c_id")
      .orderBy("_id")
  }

  def q196RealStoreCascade(s: SparkSession, dir: String): DataFrame = {
    val store = cascadeStore(s)
    val counts = store.readHistory("bib").groupBy(col("_id").as("c_id"))
      .agg(count(lit(1)).as("n_versions"))
    // live linked subfields store NO value (reference BSON semantics);
    // a reader resolves through the auth dimension, which after the
    // cascade commit carries the changed heading
    val resolved = MarcContext.resolveLinkedAuto(
      store.read("bib"), store.read("auth").toDF()).toDF()
    resolved
      .select(col("_id"), firstVal("650").as("subject"))
      .join(counts, col("_id") === col("c_id")).drop("c_id")
      .orderBy("_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q187_real_marc_dsl" -> (q187RealMarcDsl _),
    "q188_real_browse" -> (q188RealBrowse _),
    "q189_real_auth_resolve" -> (q189RealAuthResolve _),
    "q190_real_partial_lookup" -> (q190RealPartialLookup _),
    "q191_real_cascade" -> (q191RealCascade _),
    "q192_real_auth_use" -> (q192RealAuthUse _),
    "q193_real_browse_fallback" -> (q193RealBrowseFallback _),
    "q194_real_not_regex_fallback" -> (q194RealNotRegexFallback _),
    "q195_real_text_overcap_raise" -> (q195RealTextOvercapRaise _),
    "q196_real_store_cascade" -> (q196RealStoreCascade _),
    "q197_real_xref_overcap" -> (q197RealXrefOvercap _),
    "q198_real_xref_overcap_not" -> (q198RealXrefOvercapNot _),
    "q201_bulk_recascade" -> (q201BulkRecascade _))

  private def withCorpus(body: String): String =
    s"""WITH real_auths AS (
       |$duckAuthsSql
       |), real_bibs AS (
       |$duckBibsSql
       |)
       |$body""".stripMargin

  val oracle: Map[String, String] = Map(
    "q187_real_marc_dsl" -> withCorpus(
      s"""SELECT bib_id AS _id FROM real_bibs
         |WHERE xref IN (SELECT auth_id FROM real_auths
         |               WHERE heading = '${headingOf(targetAuth)}')
         |  AND regexp_matches(title, '^w3')
         |ORDER BY _id""".stripMargin),
    "q188_real_browse" -> withCorpus(
      """SELECT bib_id AS _id
        |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
        |WHERE regexp_matches(a.heading, 'w44')
        |ORDER BY _id""".stripMargin),
    "q189_real_auth_resolve" -> withCorpus(
      """SELECT bib_id AS _id, heading AS subject
        |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
        |ORDER BY _id""".stripMargin),
    "q190_real_partial_lookup" -> withCorpus(
      """SELECT heading AS value, CAST(auth_id AS BIGINT) AS xref FROM real_auths
        |WHERE contains(lower(heading), 'w44')
        |ORDER BY value, xref LIMIT 25""".stripMargin),
    "q191_real_cascade" -> withCorpus(
      s"""SELECT bib_id AS _id,
         |  CASE WHEN xref = $targetAuth THEN '651' ELSE '650' END AS subject_tag,
         |  CASE WHEN xref = $targetAuth THEN '$changedHeading' ELSE heading END AS subject
         |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
         |ORDER BY _id""".stripMargin),
    "q192_real_auth_use" -> withCorpus(
      """SELECT CAST(xref AS BIGINT) AS xref, COUNT(*) AS use_count
        |FROM real_bibs GROUP BY 1 ORDER BY xref""".stripMargin),
    // the fallback gates share their primary-path twins' oracle BODIES
    // — the gate is exactly "the degraded plan computes the same set"
    "q193_real_browse_fallback" -> withCorpus(
      """SELECT bib_id AS _id
        |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
        |WHERE regexp_matches(a.heading, 'w44')
        |ORDER BY _id""".stripMargin),
    "q194_real_not_regex_fallback" -> withCorpus(
      """SELECT bib_id AS _id FROM real_bibs
        |WHERE NOT regexp_matches(title, '^w3')
        |ORDER BY _id""".stripMargin),
    "q195_real_text_overcap_raise" -> withCorpus(
      """SELECT bib_id AS _id FROM real_bibs
        |WHERE NOT list_contains(string_split(title, ' '), 'w3')
        |ORDER BY _id""".stripMargin),
    "q196_real_store_cascade" -> withCorpus(
      s"""SELECT bib_id AS _id,
         |  CASE WHEN xref = $targetAuth THEN '$changedHeading' ELSE heading END AS subject,
         |  CAST(CASE WHEN xref = $targetAuth THEN 2 ELSE 1 END AS BIGINT) AS n_versions
         |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
         |WHERE bib_id % 5 = 0
         |ORDER BY _id""".stripMargin),
    "q197_real_xref_overcap" -> withCorpus(
      """SELECT bib_id AS _id
        |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
        |WHERE regexp_matches(b.title, '^w3') OR regexp_matches(a.heading, 'w44')
        |ORDER BY _id""".stripMargin),
    "q198_real_xref_overcap_not" -> withCorpus(
      s"""SELECT bib_id AS _id FROM real_bibs
         |WHERE xref NOT IN (SELECT auth_id FROM real_auths
         |                   WHERE heading = '${headingOf(targetAuth)}')
         |ORDER BY _id""".stripMargin),
    "q201_bulk_recascade" -> withCorpus(
      s"""SELECT bib_id AS _id,
         |  CASE WHEN xref < 1500 THEN '651' ELSE '650' END AS subject_tag,
         |  heading || ' v2' AS subject,
         |  CAST(2 AS BIGINT) AS n_versions
         |FROM real_bibs b JOIN real_auths a ON b.xref = a.auth_id
         |WHERE bib_id % 5 = 0
         |ORDER BY _id""".stripMargin))
}
