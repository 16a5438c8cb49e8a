package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.spark.ScalableRank

/** ScalableRank must agree bit-for-bit with the single-partition
  * global window it replaces, across dup keys, nulls, and more
  * partitions than rows. */
class ScalableRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def globalWindowRank(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("rank", row_number().over(
      Window.orderBy(col("k").asc_nulls_last, col("id").asc)).cast("long"))
    .select("id", "rank")

  test("matches the global-window rank on dup keys + nulls") {
    val rows = Seq(
      (1L, "b"), (2L, "a"), (3L, null), (4L, "a"), (5L, "c"),
      (6L, "a"), (7L, null), (8L, "b"), (9L, "0a"), (10L, "a")
    )
    val df = rows.toDF("id", "k")
    val expected = globalWindowRank(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ScalableRank.withGlobalRank(df, "rank",
        Seq(col("k").asc_nulls_last, col("id").asc))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("rank is a 1..n permutation under heavy key skew") {
    val df = spark.range(1, 1001)
      .select(col("id"), (col("id") % 3).cast("string").as("k"))
    val ranks = ScalableRank.withGlobalRank(df, "rank",
        Seq(col("k").asc_nulls_last, col("id").asc), numPartitions = 8)
      .select("rank").as[Long].collect().sorted
    assert(ranks.toSeq === (1L to 1000L))
    // order agrees with the global window on a sample
    val expected = globalWindowRank(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = ScalableRank.withGlobalRank(df, "rank",
        Seq(col("k").asc_nulls_last, col("id").asc), numPartitions = 8)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("empty input and more partitions than rows") {
    val empty = Seq.empty[(Long, String)].toDF("id", "k")
    assert(ScalableRank.withGlobalRank(empty, "rank",
      Seq(col("k").asc, col("id").asc)).count() === 0L)
    val tiny = Seq((1L, "x"), (2L, "a")).toDF("id", "k")
    val got = ScalableRank.withGlobalRank(tiny, "rank",
        Seq(col("k").asc, col("id").asc), numPartitions = 16)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("plan has no single-partition exchange") {
    val df = spark.range(1, 100).select(col("id"), col("id").cast("string").as("k"))
    val ranked = ScalableRank.withGlobalRank(df, "rank",
      Seq(col("k").asc, col("id").asc), numPartitions = 4)
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"ScalableRank must not funnel through one partition:\n$plan")
  }
}
