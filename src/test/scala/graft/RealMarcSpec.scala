package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.RealMarc

/** Statistical claims of the realistic MARC heading dimension, pinned
  * as numbers: the gates (q187-q192) prove Spark == DuckDB on query
  * RESULTS; this spec proves the corpus has the production shape the
  * MARC family is graded against — Zipfian heading vocabulary, skewed
  * bib→auth attachment — and that the Scala replica of the generator
  * arithmetic cannot drift from the SQL it parameterizes the q187
  * query literal for. */
class RealMarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val auths = RealMarc.authsRel(spark).cache()
  private lazy val bibs = RealMarc.bibsRel(spark).cache()

  test("Scala literal replica equals the Spark-SQL generator (q187's query literal)") {
    val generated = auths.where(col("auth_id") === RealMarc.targetAuth)
      .select("heading").head().getString(0)
    assert(generated === RealMarc.headingOf(RealMarc.targetAuth))
    // and for a sample across tiers of auth ids
    val sample = auths.where(col("auth_id") % 271 === 0)
      .select("auth_id", "heading").collect()
    sample.foreach { r =>
      assert(r.getString(1) === RealMarc.headingOf(r.getLong(0)),
        s"drift at auth ${r.getLong(0)}")
    }
  }

  test("heading dimension: Zipf vocabulary, near-distinct headings") {
    assert(auths.count() === RealMarc.nAuths)
    val toks = auths.select(explode(split(col("heading"), " ")).as("t")).cache()
    val vocab = toks.select(countDistinct(col("t"))).head().getLong(0)
    // 9,000 draws over the 20k-rank mixture: thousands of distinct
    // tokens (TPC-H part names have ~90)
    assert(vocab > 2000, s"vocab $vocab")
    // Zipf head: most frequent token well above uniform share
    val top = toks.groupBy("t").count().orderBy(desc("count")).head().getLong(1)
    assert(top.toDouble / (RealMarc.nAuths * 3) > 0.004, s"head share $top")
    // headings near-distinct with occasional realistic collisions
    val distinct = auths.select(countDistinct(col("heading"))).head().getLong(0)
    assert(distinct > RealMarc.nAuths * 95 / 100, s"distinct headings $distinct")
    toks.unpersist()
  }

  test("attachment skew: head auths ~375 bibs, tail ~1, target auth is head") {
    assert(bibs.count() === RealMarc.nBibs)
    val counts = bibs.groupBy("xref").count().cache()
    val head = counts.where(col("xref") < 20)
      .agg(min("count"), max("count")).head()
    // 50% of 15,000 over 20 head auths ≈ 375 each
    assert(head.getLong(0) > 280 && head.getLong(1) < 480, s"head range $head")
    val tailMedian = counts.where(col("xref") >= 600)
      .agg(expr("percentile(count, 0.5)")).head().getDouble(0)
    assert(tailMedian <= 2.0, s"tail median $tailMedian")
    // the cascade/DSL target carries a production-sized attached set
    val target = counts.where(col("xref") === RealMarc.targetAuth).head().getLong(1)
    assert(target > 280, s"target auth attachment $target")
    counts.unpersist()
  }

  test("gate selectivities are non-trivial (no vacuously-green gates)") {
    // q187: exact-heading xref hit AND title regex — tens of rows
    val dsl = RealMarc.q187RealMarcDsl(spark, "").count()
    assert(dsl > 5 && dsl < 200, s"q187 rows $dsl")
    // q188: browse regex hits a mid-selectivity slice of the dimension
    val browse = RealMarc.q188RealBrowse(spark, "").count()
    assert(browse > 10 && browse < 2000, s"q188 rows $browse")
    // q190: typeahead fills its full 25-row page
    assert(RealMarc.q190RealPartialLookup(spark, "").count() === 25)
    // q191: the cascade rewrites the head auth's attached set only
    val casc = RealMarc.q191RealCascade(spark, "")
    val changed = casc.where(col("subject_tag") === "651").count()
    assert(changed > 280 && changed < 480, s"cascaded rows $changed")
    assert(casc.count() === RealMarc.nBibs)
  }

  test("over-cap fallback gates actually engage the fallback (cap 10 < resolved set)") {
    // q193's browse regex resolves >10 distinct heading values, so the
    // forced maxResolvedValues=10 provably routes through the
    // direct-predicate branch (a vacuous gate would pass with an
    // in-list too — this pins that it CANNOT be the in-list)
    val browseVals = auths.where(col("heading").rlike("w44")).count()
    assert(browseVals > 10, s"browse regex resolves only $browseVals values")
    // q194: the 245 regex resolution sees >10 distinct titles
    val titleVals = bibs.where(col("title").rlike("^w3"))
      .select(countDistinct(col("title"))).head().getLong(0)
    assert(titleVals > 10, s"title regex resolves only $titleVals values")
    // q195: the 245 TEXT resolution (exact token 'w3', a different and
    // smaller set than the regex prefix match) also exceeds the cap —
    // so the capped compiler provably hits the over-cap raise, not an
    // in-list that happens to fit
    val tokenVals = bibs.where(array_contains(split(col("title"), " "), "w3"))
      .select(countDistinct(col("title"))).head().getLong(0)
    assert(tokenVals > 10, s"title token resolution resolves only $tokenVals values")
    // and the fallback answers equal their primary-path complements
    val all = RealMarc.nBibs
    val pos187style = bibs.where(col("title").rlike("^w3")).count()
    val neg = RealMarc.q194RealNotRegexFallback(spark, "").count()
    assert(neg === all - pos187style, s"q194 $neg + positive $pos187style != $all")
    val posToken = bibs.where(array_contains(split(col("title"), " "), "w3")).count()
    val negText = RealMarc.q195RealTextOvercapRaise(spark, "").count()
    assert(negText === all - posToken, s"q195 $negText + positive $posToken != $all")
  }

  test("over-cap XREF gates engage the flag join (q197/q198)") {
    // q197: the heading regex resolves well over the forced cap of 5
    val regexAuths = auths.where(col("heading").rlike("w44")).count()
    assert(regexAuths > 5, s"heading regex resolves only $regexAuths xrefs")
    // the flag join computes the same set as the default INSET path
    // (same compound query, OR-nested so both legs compile to
    // predicates; only the xref cap differs between the two runs)
    val viaFlag = RealMarc.q197RealXrefOvercap(spark, "")
      .collect().map(_.getLong(0)).toSeq
    val viaInList = {
      val c = new graft.spark.SparkQueryCompiler(spark,
        RealMarc.marcBibs(spark), RealMarc.marcAuths(spark))
      c.run("245__a:/^w3/ OR 650__a:/w44/").select("_id").orderBy("_id")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(viaFlag === viaInList, "over-cap flag join diverges from the INSET path")
    assert(viaFlag.nonEmpty)
    // q198: NOT through the flag join = exact complement of attachment
    val attached = bibs.where(col("xref") === RealMarc.targetAuth).count()
    assert(attached > 280, s"target auth attachment $attached")
    val notAttached = RealMarc.q198RealXrefOvercapNot(spark, "").count()
    assert(notAttached === RealMarc.nBibs - attached,
      s"q198 $notAttached + attached $attached != ${RealMarc.nBibs}")
  }
}
