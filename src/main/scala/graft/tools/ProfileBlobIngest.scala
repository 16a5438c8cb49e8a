package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Root-cause profiler for the q40 blob-ingest scale ratio
  * (VERDICT r4 "What's wrong" #2): times each phase of
  * FileStore.importBatch separately at a chosen file count so the
  * per-file blob-put cost is separable from the fixed lifecycle cost
  * (md5/anti-join/checkpoint + metadata upsert + second-import dedup
  * probe). Usage: runMain graft.tools.ProfileBlobIngest [sfDir] [mod]
  */
object ProfileBlobIngest {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mod = args.lift(1).map(_.toLong).getOrElse(16L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.files.{FileStore, HadoopBlobStore}

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val base = java.nio.file.Files.createTempDirectory("graft_profile_q40").toString
    val store = new FileStore(spark, base, new HadoopBlobStore(s"file://$base/blobs"),
      numBuckets = 16)
    val files = spark.read.parquet(s"$dir/orders.parquet")
      .where(col("o_orderkey") % mod === 0)
      .select(
        concat(lit("file-"), col("o_orderkey"), lit("-"), col("o_orderpriority"))
          .cast("binary").as("content"),
        concat(lit("f"), col("o_orderkey"), lit(".txt")).as("filename"),
        array(struct(lit("isbn").as("idType"),
          col("o_orderkey").cast("string").as("value"))).as("identifiers"),
        array(lit("en")).as("languages"),
        lit("text/plain").as("mimetype"),
        lit("gate").as("source"),
        lit("tester").as("user"))
    val n = files.count()
    println(s"[profile] n_files=$n blobs at $base")
    timed("import #1 (all phases)") {
      store.importBatch(files, java.time.Instant.parse("2020-01-01T00:00:00Z"))
    }
    timed("import #2 (dedup no-op)") {
      store.importBatch(files, java.time.Instant.parse("2020-02-01T00:00:00Z"))
    }
    // isolate the raw blob-put loop at the same file count
    val blobs2 = new HadoopBlobStore(s"file://$base/blobs2")
    val payload = files.select(md5(col("content")).as("_id"), col("content"),
      col("mimetype")).localCheckpoint(true)
    timed("raw executor blob puts") {
      payload.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        rows.foreach(r => blobs2.put(r.getString(0), r.getAs[Array[Byte]](1), r.getString(2)))
      }
    }
    timed("raw metadata upsert-shape write") {
      payload.select(col("_id"), col("mimetype")).write.mode("overwrite")
        .parquet(s"$base/meta_probe")
    }
    // single-thread micro-bench: is the per-put cost Hadoop's or the FS's?
    val data = "x".getBytes
    val hb = new HadoopBlobStore(s"file://$base/blobs3")
    timed("2000 hadoop puts (1 thread)") {
      (0 until 2000).foreach(i => hb.put(f"h$i%032d", data, "text/plain"))
    }
    val nioDir = java.nio.file.Paths.get(base, "blobs4")
    java.nio.file.Files.createDirectories(nioDir)
    timed("2000 nio writes (1 thread)") {
      (0 until 2000).foreach(i =>
        java.nio.file.Files.write(nioDir.resolve(f"n$i%032d"), data))
    }
    spark.stop()
  }
}
