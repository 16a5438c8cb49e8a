package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers shared by the driver-facing query catalog.
  *
  * Numeric discipline: the driver hash-compares our parquet output
  * against DuckDB running the oracle SQL. Double-sum is order-dependent,
  * so every money/quantity aggregate is computed over DECIMAL-cast
  * inputs (exact, order-independent) and only the final value is cast
  * back to DOUBLE — mirrored verbatim in the oracle SQL. Every query
  * ends in a deterministic ORDER BY.
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read nanos as long and convert to a micros
    * timestamp column ourselves. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    t(s, dir, "events")
      // integer div: double division would lose precision at 1e18 ns
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
