package graft.tools

import graft.spark.{MarcContext, MarcSchema, MarcRow}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Write-path stress: commit the full constructed MARC corpus for a
  * scale factor through MarcStore, rebuild both indexes, re-commit an
  * updated slice (history versioning at volume), and report counts +
  * wall times. */
object StoreStress {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("crash")) { crashMain(args.drop(1)); return }
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import MarcSchema.marcRowEncoder

    val base = java.nio.file.Files.createTempDirectory("storestress").toString
    val store = new graft.store.MarcStore(spark, base)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    val auths = graft.queries.MarcOps.marcAuths(spark, sfDir).as[MarcRow]
    val bibs = graft.queries.MarcOps.marcBibs(spark, sfDir).as[MarcRow]
    timed("commit auths")(store.commit(auths, user = "stress"))
    timed("commit bibs with auth_check")(store.commit(bibs, user = "stress", authCheck = true))
    println(s"bibs=${store.read("bib").count()} auths=${store.read("auth").count()} maxId=${store.maxId("bib")}")

    timed("tag index rebuild") {
      MarcContext.tagIndex(store.read("bib").toDF().unionByName(store.read("auth").toDF()))
        .write.mode("overwrite").parquet(s"$base/tag_index")
    }
    println(s"tag index entries=${spark.read.parquet(s"$base/tag_index").count()}")

    // update a slice -> history versions. O(batch) evidence: count the
    // live files rewritten and history files before/after — a touched-
    // bucket overwrite + append must leave untouched buckets' files and
    // all prior history files in place.
    def filesUnder(p: String): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val d = new java.io.File(p)
      if (!d.exists()) Set.empty
      else walk(d).map(_.getPath).filter(_.endsWith(".parquet")).toSet
    }
    val liveBefore = filesUnder(s"$base/bibs")
    val histBefore = filesUnder(s"$base/bib_history")
    // 8 ids -> at most 8 of the 64 buckets rewritten
    val slice = store.read("bib").where(col("_id") <= 8).as[MarcRow]
      .map(r => r.copy(basket = "updated"))
    timed("re-commit 8 updated")(store.commit(slice, user = "stress2"))
    val liveAfter = filesUnder(s"$base/bibs")
    val histAfter = filesUnder(s"$base/bib_history")
    require(histBefore.subsetOf(histAfter), "history was rewritten, not appended")
    val untouched = (liveBefore intersect liveAfter).size
    println(s"live files untouched=$untouched/${liveBefore.size} " +
      s"(rewrote ${liveBefore.size - untouched} bucket files); " +
      s"history files appended=${histAfter.size - histBefore.size}")
    val versions = store.readHistory("bib").groupBy("_id").count()
      .where(col("count") > 1).count()
    println(s"records with 2+ history versions=$versions")

    timed("history query")(
      println(s"history q hits=${store.queryHistory("bib", "245__a:'1-urgent'").count()}"))
    spark.stop()
  }

  /** `StoreStress crash [sfDir]` — kill the swap protocol at every
    * injected point AT VOLUME (full corpus commits), reopen, and
    * verify all-or-nothing recovery: one distinct audit user, stable
    * row count, no dangling staging. The q199 gate runs the same
    * sequence under the DuckDB oracle at gate scale; this mode is the
    * volume probe. */
  def crashMain(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import MarcSchema.marcRowEncoder

    val base = java.nio.file.Files.createTempDirectory("storestress_crash").toString
    var store = new graft.store.MarcStore(spark, base)
    val bibs = graft.queries.MarcOps.marcBibs(spark, sfDir).as[MarcRow]
    store.commit(bibs.map(_.copy(basket = "v0")), user = "u0", authCheck = false)
    val n0 = store.read("bib").count()
    println(s"base commit: $n0 bibs")
    var prev = Set("u0")
    var expVersions = 1L
    val points = Seq("post_staging", "post_journal", "mid_rename", "post_rename",
      "post_history")
    for ((p, i) <- points.zipWithIndex) {
      graft.store.MarcStore.failpoint = Some(p)
      val t0 = System.nanoTime()
      val crashed =
        try { store.commit(bibs.map(_.copy(basket = s"v$i")), user = s"u_$p",
          authCheck = false); false } // no auth dim in this scratch store
        catch { case _: graft.store.MarcStore.CrashInjected => true }
      require(crashed, s"failpoint $p did not fire")
      store = new graft.store.MarcStore(spark, base) // reopen = recovery sweep
      val users = store.read("bib").toDF().select("user").distinct()
        .collect().map(_.getString(0)).toSet
      val n = store.read("bib").count()
      require(users.size == 1, s"MIXED state after $p: $users")
      require(n == n0, s"row count drifted after $p: $n != $n0")
      require(users == prev || users == Set(s"u_$p"), s"state after $p neither old nor new")
      // version rows commit atomically with the live swap (r11)
      if (users == Set(s"u_$p")) expVersions += 1
      val hist = store.readHistory("bib").count()
      require(hist == n0 * expVersions,
        s"history drifted after $p: $hist != ${n0 * expVersions}")
      require(!new java.io.File(s"$base/bibs_staging").exists(), s"$p left staging")
      require(!new java.io.File(s"$base/bib_history_staging").exists(),
        s"$p left history staging")
      println(f"$p%-13s -> recovered to ${users.head}%-15s " +
        f"(${(System.nanoTime() - t0) / 1e9}%.1f s incl. crash+reopen)")
      prev = users
    }
    println("ALL CRASH POINTS RECOVER ALL-OR-NOTHING (live + history)")
    spark.stop()
  }
}
