package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.RealCorpus

/** Statistical claims of the cross-engine realistic corpus generator,
  * pinned as numbers: the gates (q174-q181) prove Spark == DuckDB on
  * query RESULTS; this spec proves the corpus itself has the shape the
  * text-family algorithms are graded against (a uniform-vocab corpus
  * that still matched the oracle would pass the gates while measuring
  * nothing). */
class RealCorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private lazy val docs = RealCorpus.docs(spark).cache()

  test("corpus shape: size, vocabulary, skewed lengths") {
    assert(docs.count() === RealCorpus.nDocs)
    val toks = docs.select(explode(split(col("text"), " ")).as("t")).cache()
    val vocab = toks.select(countDistinct(col("t"))).head().getLong(0)
    // three tiers cover ranks 1..19999; the tail tier is sampled, so
    // realized vocabulary is large but below the ceiling
    assert(vocab > 10000 && vocab < 20000, s"vocab $vocab")
    // Zipf head: the single most frequent token carries a few percent
    // of all tokens (uniform 20k vocab would give it ~0.005%)
    val total = toks.count()
    val top = toks.groupBy("t").count().orderBy(desc("count")).head().getLong(1)
    assert(top.toDouble / total > 0.005, s"head share ${top.toDouble / total}")
    val lens = docs.select(size(split(col("text"), " ")).as("n"))
      .agg(min("n"), expr("percentile(n, 0.5)"), max("n"), avg("n")).head()
    assert(lens.getInt(0) >= 25)
    assert(lens.getInt(2) <= 407) // 399 body + 8 header
    // right-skewed: mean well above median
    assert(lens.getDouble(3) > lens.getDouble(1) * 1.2, s"lens $lens")
    toks.unpersist()
  }

  test("boilerplate header: ~30% of docs share the literal 8-token prefix") {
    val withHdr = docs.where(col("text").startsWith(RealCorpus.headerLiteral + " ")).count()
    val frac = withHdr.toDouble / RealCorpus.nDocs
    assert(frac > 0.25 && frac < 0.35, s"boiler fraction $frac")
  }

  test("planted near-duplicates sit in true near-dup territory (shingle J in (0.4, 0.8))") {
    import graft.queries.TextOps.shingleArray
    val sets = docs
      .select(col("doc_id"), shingleArray(split(col("text"), " "), 3).as("ts"))
    val pairs = sets.as("a").join(sets.as("b"),
        col("a.doc_id") % 7 === 3 && col("b.doc_id") === col("a.doc_id") - 1)
      .select(
        (size(array_intersect(col("a.ts"), col("b.ts"))).cast("double") /
          size(array_union(col("a.ts"), col("b.ts"))).cast("double")).as("j"))
    val stats = pairs.agg(count(lit(1)), min("j"), avg("j"), max("j")).head()
    // ids 3, 10, ..., 1999: ceil((nDocs - 3) / 7) planted copies
    assert(stats.getLong(0) === (RealCorpus.nDocs - 3 + 6) / 7, s"pair count ${stats.getLong(0)}")
    assert(stats.getDouble(2) > 0.4 && stats.getDouble(2) < 0.8, s"mean J ${stats.getDouble(2)}")
    // every planted pair crosses the tau=1/2 family threshold region:
    // none collapses to exact-dup (J=1), none is unrelated (J~0)
    assert(stats.getDouble(1) > 0.3, s"min J ${stats.getDouble(1)}")
    assert(stats.getDouble(3) < 0.95, s"max J ${stats.getDouble(3)}")
  }

  test("q176 oracle subset (1000 docs) preserves the corpus structure") {
    // the gate's all-pairs DuckDB oracle runs on doc_id < 1000 to
    // bound driver cost; this pins what that prefix provably keeps —
    // the quantities the set-sim algorithm is graded against
    val sub = docs.where(col("doc_id") < 1000)
    // planted near-dup pairs: both members of a (b, b+1 with b+1%7==3)
    // pair land in the prefix together, so density carries over
    val planted = sub.where(col("doc_id") % 7 === 3).count()
    assert(planted >= 140, s"planted pairs in subset: $planted")
    // boilerplate representation matches the full corpus (~30%)
    val frac = sub.where(col("text").startsWith(RealCorpus.headerLiteral + " "))
      .count().toDouble / 1000
    assert(frac > 0.25 && frac < 0.35, s"subset boiler fraction $frac")
    // right-skewed length spectrum survives (median and mean within
    // 15% of the full corpus — the PPJoin length filter sees the same
    // distribution the full gate would)
    def lenStats(df: org.apache.spark.sql.DataFrame) = df
      .select(size(split(col("text"), " ")).as("n"))
      .agg(expr("percentile(n, 0.5)"), avg("n")).head()
    val (fm, fa) = { val r = lenStats(docs); (r.getDouble(0), r.getDouble(1)) }
    val (sm, sa) = { val r = lenStats(sub); (r.getDouble(0), r.getDouble(1)) }
    assert(math.abs(sm - fm) / fm < 0.15, s"median drift $sm vs $fm")
    assert(math.abs(sa - fa) / fa < 0.15, s"mean drift $sa vs $fa")
  }

  test("realistic vector corpus: Zipf cluster spectrum, planted dups, centroid seeds") {
    // the vector twin of the text-shape tests above: the q182-q185
    // gates prove Spark == DuckDB on results; this pins that the
    // clustered corpus actually HAS the structure those gates are
    // graded against (an isotropic corpus passing the oracles would
    // measure nothing about banding selectivity or centroid scoping)
    import graft.queries.RealVec
    val all = RealVec.vecs(spark).cache()
    assert(all.count() === RealVec.nVecs)
    // the k=8 centroid seed set exists (semdedup scopes on vec_id < 8)
    assert(all.where(col("vec_id") < 8).count() === 8)
    // planted near-dups at gate-relevant volume (vec_id % 7 == 3
    // jitters its predecessor: ~285 pairs across the corpus)
    val planted = all.where(col("vec_id") % 7 === 3).count()
    assert(planted >= 280, s"planted dups: $planted")
    // Zipf cluster spectrum: 4 giant clusters carry ~35% of vectors
    // (the generator's tier split) and all 40 clusters are populated
    val giants = all.where(col("label").isin("c1", "c2", "c3", "c4")).count()
    val gf = giants.toDouble / RealVec.nVecs
    assert(gf > 0.28 && gf < 0.42, s"giant-cluster mass: $gf")
    val clusters = all.select(countDistinct(col("label"))).head().getLong(0)
    assert(clusters === 40L, s"clusters populated: $clusters of 40")
    all.unpersist()
  }

  test("generator is deterministic: same rows on re-generation") {
    // bit_xor, not sum: an order-free fold that cannot overflow under
    // ANSI arithmetic
    def h(df: org.apache.spark.sql.DataFrame): Long = df
      .select(xxhash64(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")).as("h"))
      .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(h(docs) === h(RealCorpus.docs(spark)))
  }
}
