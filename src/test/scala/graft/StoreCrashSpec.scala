package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.spark._
import graft.store.MarcStore
import Fixtures._

/** Crash-point recovery of the stage-and-swap commit protocol
  * (MarcStore.swapBuckets / recoverStaging): direction-exact — a crash
  * BEFORE the journal must roll back (old state), a crash at or after
  * the journal must roll forward (new state). The q199 gate asserts
  * all-or-nothing at volume; this pins WHICH side each window lands
  * on, at fixture scale. */
class StoreCrashSpec extends AnyFunSuite {

  lazy val spark = SparkTestSession.spark
  import MarcSchema.marcRowEncoder

  private def freshBase(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_crash_spec")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def bibs(marker: String) =
    MarcSchema.toDataset(spark, Seq(bib1, bib2)).map(_.copy(basket = marker))

  private def baskets(store: MarcStore): Set[String] =
    store.read("bib").toDF().select("basket").distinct()
      .collect().map(_.getString(0)).toSet

  test("pre-journal crash rolls back; post-journal crashes roll forward") {
    val base = freshBase()
    var store = new MarcStore(spark, base, numBuckets = 4)
    store.commit(bibs("v1"), user = "u", authCheck = false)
    assert(baskets(store) === Set("v1"))

    // journal not yet written -> recovery must ROLL BACK to v1
    MarcStore.failpoint = Some("post_staging")
    intercept[MarcStore.CrashInjected] {
      store.commit(bibs("v2"), user = "u", authCheck = false)
    }
    store = new MarcStore(spark, base, numBuckets = 4)
    assert(baskets(store) === Set("v1"), "pre-journal crash must leave the old table")

    // journal written -> recovery must ROLL FORWARD, even when zero,
    // one, or all of the renames already happened
    for ((p, marker) <- Seq("post_journal" -> "v2", "mid_rename" -> "v3",
        "post_rename" -> "v4")) {
      MarcStore.failpoint = Some(p)
      intercept[MarcStore.CrashInjected] {
        store.commit(bibs(marker), user = "u", authCheck = false)
      }
      store = new MarcStore(spark, base, numBuckets = 4)
      assert(baskets(store) === Set(marker), s"$p crash must recover to the new table")
      assert(store.read("bib").count() === 2)
      assert(!new java.io.File(s"$base/bibs_staging").exists(), s"$p left staging behind")
    }
  }

  test("recovery is idempotent and a clean store is untouched by it") {
    val base = freshBase()
    var store = new MarcStore(spark, base, numBuckets = 4)
    store.commit(bibs("v1"), user = "u", authCheck = false)
    MarcStore.failpoint = Some("mid_rename")
    intercept[MarcStore.CrashInjected] {
      store.commit(bibs("v2"), user = "u", authCheck = false)
    }
    // two successive reopens: the second sees no staging and changes nothing
    store = new MarcStore(spark, base, numBuckets = 4)
    val after1 = store.read("bib").toDF().orderBy("_id").collect().toSeq
    store = new MarcStore(spark, base, numBuckets = 4)
    val after2 = store.read("bib").toDF().orderBy("_id").collect().toSeq
    assert(after1 === after2)
    assert(baskets(store) === Set("v2"))
    // and the recovered store commits normally afterwards
    store.commit(bibs("v3"), user = "u", authCheck = false)
    assert(baskets(store) === Set("v3"))
  }
}
