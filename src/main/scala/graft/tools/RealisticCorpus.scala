package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Generates a documents table with REALISTIC text statistics, as a
  * drop-in `srcDir` for ScaleBench's text-family probes.
  *
  * The shipped synthetic corpus has a 31-token base vocabulary and
  * uniform ~50-token docs (SCALING.md measures it). That shape flatters
  * nothing and floods one thing: every 3-shingle is corpus-dense, so
  * prefix-filtered similarity joins (q142) generate candidates
  * near-quadratically, while the PPJoin length filter never prunes
  * (uniform lengths). Real corpora are the opposite: Zipfian vocabulary
  * (a long tail of rare words makes rare-first prefixes selective) and
  * right-skewed doc lengths (the length filter bites). This tool
  * produces that shape deterministically so text-family scale ratios
  * measure the algorithm, not the corpus defect:
  *
  *  - ~50k-word vocabulary, ranks sampled with P(rank=r) proportional
  *    to 1/r (classic Zipf s=1) via inverse-CDF: rank = floor(V^u) for
  *    uniform u, so the top word carries ~9% of tokens — about what
  *    "the" carries in English.
  *  - doc length = 25 + floor(1125*u^4): median ~95, mean ~250, max
  *    ~1150 tokens — right-skewed like web text.
  *  - ~30% of docs start with a shared 8-token boilerplate header
  *    drawn from the HIGH-frequency ranks: realistic shared prefixes
  *    that a rare-first canonical token order must rank last.
  *  - every random draw is hash(doc_id, position, salt)-seeded: the
  *    same args always emit byte-identical rows (safe to regenerate,
  *    diffable across rounds), and generation is embarrassingly
  *    parallel over spark.range partitions.
  *
  * Schema matches /root/testdata documents.parquet exactly
  * (doc_id, text, lang, source, n_chars), so ScaleBench fuzz/exact
  * replication and every text gate run unchanged against the output.
  *
  * Usage: runMain graft.tools.RealisticCorpus [outDir] [nDocs] [vocab]
  */
object RealisticCorpus {
  /** Generation-formula version — bump on ANY change to the column
    * expressions below (Zipf exponent, header scheme, hash salts, …).
    * Combined with the args into the fingerprint that consumers
    * (RealBench) compare before trusting a pre-existing corpus dir, so
    * a stale corpus from an older generator regenerates instead of
    * silently feeding the gate. */
  val generatorVersion = 1

  def fingerprint(nDocs: Long, vocab: Long): String =
    s"realistic-corpus-v$generatorVersion-docs$nDocs-vocab$vocab"

  /** True iff outDir holds a corpus written by THIS generator version
    * with these params (the _SUCCESS-style stamp main() writes last). */
  def isCurrent(outDir: String, nDocs: Long = 5000L, vocab: Long = 50000L): Boolean = {
    val p = java.nio.file.Paths.get(s"$outDir/GENERATOR.fp")
    java.nio.file.Files.exists(p) &&
      java.nio.file.Files.readString(p).trim == fingerprint(nDocs, vocab)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/graft_realistic_src")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(5000L)
    val vocab = args.lift(2).map(_.toLong).getOrElse(50000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // uniform(0,1) from a salted 32-bit hash — deterministic, columnar
    def u(salt: Any*): org.apache.spark.sql.Column =
      (pmod(hash((col("doc_id") +: salt.map(lit)): _*), lit(1000003)).cast("double")
        + lit(0.5)) / lit(1000003.0)

    // Zipf(s=1) rank via inverse CDF over [1, vocab]
    def zipfRank(uCol: org.apache.spark.sql.Column) =
      least(floor(pow(lit(vocab.toDouble), uCol)).cast("long"), lit(vocab - 1)) + 1

    val docs = spark.range(nDocs).toDF("doc_id")
      .withColumn("len", (lit(25) + floor(lit(1125.0) * pow(u("len"), lit(4.0)))).cast("int"))
      .withColumn("boiler", u("boiler") < 0.3)
      // per-position Zipf token; boilerplate docs share an 8-token
      // header of high-frequency words (ranks 1..40, doc-independent)
      .withColumn("body", transform(sequence(lit(1), col("len")),
        i => concat(lit("w"), zipfRank((pmod(hash(col("doc_id"), i, lit(7)), lit(1000003))
          .cast("double") + lit(0.5)) / lit(1000003.0)))))
      .withColumn("header", when(col("boiler"),
        transform(sequence(lit(1), lit(8)),
          i => concat(lit("w"), pmod(hash(i, lit(13)), lit(40)) + 1)))
        .otherwise(array()))
      .withColumn("text", array_join(concat(col("header"), col("body")), " "))
      .withColumn("lang", element_at(array(lit("en"), lit("fr"), lit("es"), lit("de")),
        (pmod(hash(col("doc_id"), lit(19)), lit(4)) + 1).cast("int")))
      .withColumn("source", element_at(array(lit("web"), lit("news"), lit("wiki")),
        (pmod(hash(col("doc_id"), lit(23)), lit(3)) + 1).cast("int")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")

    docs.repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    // avg_len is the PER-DOC mean, so aggregate doc lengths before
    // exploding — averaging n on the exploded frame weights each doc
    // by its own token count (biased high on a right-skewed corpus)
    val words = spark.read.parquet(s"$outDir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val avgLen = words.select(size(col("w")).as("n"))
      .agg(avg(col("n"))).head().getDouble(0)
    val stats = words.select(explode(col("w")).as("tok"))
      .agg(count(lit(1)).as("tokens"), countDistinct(col("tok")).as("vocab"))
      .head()
    println(s"""{"docs":$nDocs,"tokens":${stats.getLong(0)},"vocab":${stats.getLong(1)},"avg_len":$avgLen,"out":"$outDir"}""")
    // stamp LAST so a crashed/partial generation never looks current
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/GENERATOR.fp"), fingerprint(nDocs, vocab) + "\n")
    spark.stop()
  }
}
