package graft.files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Content-addressed file store: MD5-keyed metadata + blob storage
  * (reference dlx/file/__init__.py:71-388; jfile.schema.json shape).
  *
  * The S3 upload becomes a [[BlobStore]] (Hadoop-FS path at scale); a
  * batch ingest is `spark.read.format("binaryFile")` -> md5(content)
  * -> anti-join on existing checksums -> conflict checks as joins
  * (SURVEY §2.2 File.import row).
  */
final case class Identifier(idType: String, value: String) {
  def eqv(other: Identifier): Boolean =
    idType == other.idType && value.toLowerCase == other.value.toLowerCase
}

final case class FileRecord(
    _id: String, // md5 hex checksum
    filename: String,
    identifiers: Seq[Identifier],
    languages: Seq[String],
    mimetype: String,
    size: Long,
    source: String,
    timestamp: java.sql.Timestamp,
    uri: String,
    user: String,
    updated: java.sql.Timestamp)

class FileExists(msg: String = "File already exists") extends RuntimeException(msg)
class FileExistsIdentifierConflict(checksum: String)
  extends FileExists(s"File $checksum already exists but with different identifiers")
class FileExistsLanguageConflict(checksum: String)
  extends FileExists(s"File $checksum already exists but with different languages")

trait BlobStore extends Serializable {
  def put(checksum: String, data: Array[Byte], mimetype: String): String // returns uri
  /** deterministic content-addressed uri (batch ingest computes it
    * without a round-trip to the executors). */
  def uriFor(checksum: String): String = checksum
}

final class LocalBlobStore(dir: String) extends BlobStore {
  new java.io.File(dir).mkdirs()
  def put(checksum: String, data: Array[Byte], mimetype: String): String = {
    val f = java.nio.file.Paths.get(dir, checksum)
    java.nio.file.Files.write(f, data)
    f.toString
  }
  override def uriFor(checksum: String): String =
    java.nio.file.Paths.get(dir, checksum).toString
}

/** Hadoop-FileSystem blob backend — the public-safe analog of the
  * reference's S3 store (dlx/file/s3.py): one URI scheme covers
  * s3a://, gs://, abfs://, hdfs:// and file://. The FileSystem handle
  * is constructed lazily on whichever JVM calls put(), so the store is
  * safe to ship into `foreachPartition` for distributed ingest. */
final class HadoopBlobStore(baseUri: String) extends BlobStore {
  @transient private lazy val fs = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val f = new org.apache.hadoop.fs.Path(baseUri).getFileSystem(conf)
    // blobs are content-addressed (md5 IS the integrity check): FS-level
    // .crc sidecars only double the file count per put
    f.setWriteChecksum(false)
    f.setVerifyChecksum(false)
    f
  }
  // file:// scheme — measured root cause of the q40 scale ratio
  // (ProfileBlobIngest): without native-hadoop, every Hadoop local
  // create round-trips the default permission through a FORKED chmod
  // (~4 ms/put, and the fork lock serializes across executor threads
  // — 265 puts/s TOTAL at any parallelism). Content-addressed blobs
  // don't need the permission dance, so local puts go straight
  // through NIO (~15 µs); object-store schemes (s3a/gs/abfs/hdfs)
  // keep the Hadoop path, where create IS the parallel-put fast path.
  @transient private lazy val localDir: Option[java.nio.file.Path] = {
    val uri = new org.apache.hadoop.fs.Path(baseUri).toUri
    if (uri.getScheme == null || uri.getScheme == "file") {
      val p = java.nio.file.Paths.get(uri.getPath)
      java.nio.file.Files.createDirectories(p)
      Some(p)
    } else None
  }
  def put(checksum: String, data: Array[Byte], mimetype: String): String =
    localDir match {
      case Some(d) =>
        java.nio.file.Files.write(d.resolve(checksum), data)
        new org.apache.hadoop.fs.Path(baseUri, checksum).toString
      case None =>
        val path = new org.apache.hadoop.fs.Path(baseUri, checksum)
        val out = fs.create(path, true)
        try out.write(data) finally out.close()
        path.toString
    }
  override def uriFor(checksum: String): String =
    new org.apache.hadoop.fs.Path(baseUri, checksum).toString
}

final class FileStore(spark: SparkSession, basePath: String, blobs: BlobStore,
    numBuckets: Int = 64, lockWaitMs: Long = 600000L) {
  import spark.implicits._

  private val tablePath = s"$basePath/files"

  private val canonicalCols = Seq("_id", "filename", "identifiers", "languages",
    "mimetype", "size", "source", "timestamp", "uri", "user", "updated")

  /** checksum-derived bucket: first 16 bits of the md5 hex, mod
    * numBuckets — uniform by construction. */
  private def bucketCol: org.apache.spark.sql.Column =
    pmod(conv(substring(col("_id"), 1, 4), 16, 10).cast("long"), lit(numBuckets.toLong))

  private def hasParquet(path: String): Boolean = {
    def walk(f: java.io.File): Boolean =
      if (f.isDirectory) { val fs = f.listFiles(); fs != null && fs.exists(walk) }
      else f.getName.endsWith(".parquet")
    val d = new java.io.File(path)
    d.exists() && walk(d)
  }

  /** One read plan per table generation (same rationale as MarcStore:
    * `spark.read.parquet` re-lists the bucketed dir tree on every
    * call); invalidated by any same-JVM store's write via the shared
    * [[graft.store.TableGenerations]]. */
  private var cached: Option[(Long, DataFrame)] = None

  private def readRaw(): DataFrame = synchronized {
    val gen = graft.store.TableGenerations.generation(tablePath)
    cached match {
      case Some((g, df)) if g == gen => df
      case _ =>
        val df =
          if (!hasParquet(tablePath))
            spark.emptyDataset[FileRecord].toDF().withColumn("id_bucket", lit(0L)).limit(0)
          else spark.read.parquet(tablePath)
        cached = Some((gen, df))
        df
    }
  }

  def read(): DataFrame = readRaw().select(canonicalCols.map(col): _*)

  /** Upsert metadata rows by checksum: rewrite ONLY the id buckets the
    * batch touches (stage → swap) — write cost is O(touched buckets),
    * never O(table). CRASH-SAFE with the same commit-journal protocol
    * as MarcStore.swapBuckets (round-11: a crash between two bucket
    * renames used to leave the file table permanently mixed): staging
    * completes, the journal is written atomically (tmp + rename), only
    * then do renames start; [[recoverStaging]] — at store open and
    * before every upsert — rolls forward iff the journal exists. */
  private def upsert(meta: DataFrame): Unit =
      graft.store.StoreLock.withLock(basePath, lockWaitMs) {
    recoverStaging()
    val withBucket = meta.select(canonicalCols.map(col): _*)
      .withColumn("id_bucket", bucketCol)
    val touched = withBucket.select("id_bucket").distinct().as[Long].collect()
    val survivors = readRaw()
      .where(col("id_bucket").isin(touched: _*))
      .join(meta.select(col("_id").as("m_id")), col("_id") === col("m_id"), "left_anti")
      .drop("m_id")
    val staging = tablePath + "_staging"
    rmDir(new java.io.File(staging))
    survivors.unionByName(withBucket)
      .repartition(math.max(touched.length, 1), col("id_bucket"))
      .write.partitionBy("id_bucket").mode(SaveMode.Overwrite).parquet(staging)
    graft.store.SwapJournal.write(staging, touched.toSeq.map(b =>
      s"$b,${if (new java.io.File(s"$staging/id_bucket=$b").exists()) 1 else 0}"))
    new java.io.File(tablePath).mkdirs()
    for (b <- touched) {
      val dst = new java.io.File(s"$tablePath/id_bucket=$b")
      rmDir(dst)
      val src = new java.io.File(s"$staging/id_bucket=$b")
      if (src.exists()) require(src.renameTo(dst), s"bucket swap failed: $src -> $dst")
    }
    rmDir(new java.io.File(staging))
    graft.store.TableGenerations.bump(tablePath)
    spark.catalog.refreshByPath(tablePath)
  }

  /** Roll a dangling `files_staging` forward (journal present →
    * staging complete; finish the renames) or back (journal absent or
    * malformed → no rename ever started; drop it). Idempotent. */
  private def recoverStaging(): Unit = {
    val staging = new java.io.File(tablePath + "_staging")
    if (!staging.exists()) return
    graft.store.SwapJournal.read(staging.getPath).foreach { es =>
      graft.store.SwapJournal.rollForwardBuckets(staging.getPath, tablePath, es)
    }
    rmDir(staging)
    graft.store.TableGenerations.bump(tablePath)
    spark.catalog.refreshByPath(tablePath)
  }

  // store open: finish or roll back any swap a dead writer left behind
  graft.store.StoreLock.withLock(basePath, lockWaitMs) { recoverStaging() }

  private def rmDir(f: java.io.File): Unit = graft.store.SwapJournal.deleteRecursively(f)

  def md5Hex(data: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(data)
      .map(b => f"$b%02x").mkString

  /** Import one binary (reference import_from_binary/handle semantics:
    * empty-content guard, identifier/language validation, checksum
    * dedup with conflict detection, optional overwrite). */
  def importBinary(data: Array[Byte], identifiers: Seq[Identifier], languages: Seq[String],
      mimetype: String, source: String, filename: String = null, overwrite: Boolean = false,
      user: String = null,
      now: java.time.Instant = java.time.Instant.now()): FileRecord = {
    require(identifiers.nonEmpty && languages.nonEmpty,
      "Params `identifiers` and `languages` cannot be an empty list")
    languages.foreach { l =>
      require(ISO6391.codes.contains(l.toLowerCase), "Invalid ISO 639-1 language code")
    }
    require(data.nonEmpty, "File-like object has no content")

    val checksum = md5Hex(data)
    if (!overwrite) checkFileExists(checksum, identifiers, languages)

    val uri = blobs.put(checksum, data, mimetype)
    val rec = FileRecord(checksum, filename, identifiers, languages, mimetype,
      data.length.toLong, source, java.sql.Timestamp.from(now), uri, user, null)

    upsert(Seq(rec).toDF())
    rec
  }

  /** Conflict semantics (dlx/file/__init__.py:238-250): same checksum
    * with an unseen identifier or different language set. */
  private def checkFileExists(checksum: String, identifiers: Seq[Identifier],
      languages: Seq[String]): Unit = {
    val existing = read().where(col("_id") === checksum).collect()
    if (existing.nonEmpty) {
      val row = existing.head
      val exIds = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("identifiers")
        .map(r => Identifier(r.getString(0), r.getString(1)))
      val exLangs = row.getAs[scala.collection.Seq[String]]("languages")
      identifiers.foreach { idx =>
        if (!exIds.exists(_.eqv(idx))) throw new FileExistsIdentifierConflict(checksum)
      }
      if (languages.sorted != exLangs.toSeq.sorted)
        throw new FileExistsLanguageConflict(checksum)
      throw new FileExists()
    }
  }

  /** Filename encoding — see [[FileStore.encodeFn]]. */
  def encodeFn(identifiers: Seq[String], languages: Seq[String], extension: String): String =
    FileStore.encodeFn(identifiers, languages, extension)

  def fromId(checksum: String): Option[FileRecord] = toRecords(
    read().where(col("_id") === checksum), limit = 1).headOption

  /** Case-insensitive identifier match, newest first (strength-2
    * collation + timestamp desc sort, dlx/file/__init__.py:284-304).
    * Row-level API: collects at most `limit` rows to the driver and
    * RAISES past it — set-scale callers use [[findByIdentifierDf]]. */
  def findByIdentifier(identifier: Identifier, language: Option[String] = None,
      limit: Int = FileStore.rowApiLimit): Seq[FileRecord] =
    toRecords(findByIdentifierDf(identifier, language), limit)

  /** DataFrame twin of [[findByIdentifier]] — no driver collect. */
  def findByIdentifierDf(identifier: Identifier, language: Option[String] = None): DataFrame = {
    val base = read().where(exists(col("identifiers"),
      i => i.getField("idType") === identifier.idType &&
        lower(i.getField("value")) === identifier.value.toLowerCase))
    val filtered = language.map(l => base.where(array_contains(col("languages"), l))).getOrElse(base)
    filtered.orderBy(col("timestamp").desc)
  }

  def latestByIdentifierLanguage(identifier: Identifier, language: String): Option[FileRecord] = {
    import MarcEncoders._
    // top-1 of the timestamp-desc sort (TakeOrderedAndProject) — a
    // bounded pull even when many files share the identifier
    findByIdentifierDf(identifier, Some(language)).limit(1)
      .as[FileRecord](fileRecordEncoder).collect().headOption
  }

  /** Files created or updated within [from, to) — `to` defaults to now
    * (find_by_date, dlx/file/__init__.py:307-332). Row-level API: a
    * wide date range can select the whole table, so the collect is
    * bounded by `limit` (raises past it — round-11 verdict finding #1);
    * set-scale callers use [[findByDateDf]]. */
  def findByDate(from: java.time.Instant,
      to: Option[java.time.Instant] = None,
      limit: Int = FileStore.rowApiLimit): Seq[FileRecord] =
    toRecords(findByDateDf(from, to), limit)

  /** DataFrame twin of [[findByDate]] — no driver collect. */
  def findByDateDf(from: java.time.Instant,
      to: Option[java.time.Instant] = None): DataFrame = {
    val lo = lit(java.sql.Timestamp.from(from))
    val hi = lit(java.sql.Timestamp.from(to.getOrElse(java.time.Instant.now())))
    def in(c: org.apache.spark.sql.Column) = c >= lo && c < hi
    read().where(in(col("timestamp")) || in(col("updated")))
  }

  /** Set-scale variant: latest file per (identifier value, language)
    * via window (SURVEY §2.6 latest-file row). */
  def latestPerIdentifierLanguage(): DataFrame = {
    val w = Window.partitionBy("id_value", "language").orderBy(col("timestamp").desc)
    read()
      .select(col("*"), explode(col("identifiers")).as("idf"))
      .select(col("*"), col("idf.value").as("id_value"))
      .select(col("*"), explode(col("languages")).as("language"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn", "idf")
  }

  /** Set-scale ingest — the batch form of import_from_binary for a
    * 100 TB pipeline (`spark.read.format("binaryFile")` feeds this):
    * md5 in the cluster, in-batch dedup on checksum, anti-join against
    * the existing table (existing checksums are skipped, the batch
    * analog of the FileExists path), blob puts from the executors via
    * foreachPartition, ONE metadata write for the whole batch.
    *
    * `files` columns: content (binary), filename, identifiers
    * (array<struct<idType,value>>), languages, mimetype, source, user.
    * Returns the imported metadata rows.
    */
  def importBatch(files: DataFrame,
      now: java.time.Instant = java.time.Instant.now()): DataFrame = {
    val stamped = files
      .withColumn("_id", md5(col("content")))
      .withColumn("size", length(col("content")).cast("long"))
    val fresh = stamped
      .dropDuplicates("_id")
      .join(read().select(col("_id")), Seq("_id"), "left_anti")
      .localCheckpoint(true)
    val ts = java.sql.Timestamp.from(now)
    // bind to a local so the closure ships the BlobStore, not `this`
    val uriStore = blobs
    val uriUdf = udf((checksum: String) => uriStore.uriFor(checksum))
    val meta = fresh.select(
      col("_id"), col("filename"), col("identifiers"), col("languages"),
      col("mimetype"), col("size"), col("source"),
      lit(ts).as("timestamp"),
      uriUdf(col("_id")).as("uri"),
      col("user"), lit(null).cast("timestamp").as("updated"))
    // a fully-deduped batch writes nothing (cheap probe: fresh is
    // already checkpointed)
    if (!fresh.isEmpty) {
      fresh.select("_id", "content", "mimetype").foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.foreach { r =>
            uriStore.put(r.getString(0), r.getAs[Array[Byte]](1), r.getString(2))
          }
      }
      upsert(meta)
    }
    meta
  }

  /** Metadata update (File.commit, dlx/file/__init__.py:360-364). */
  def commit(rec: FileRecord, now: java.time.Instant = java.time.Instant.now()): Unit =
    upsert(Seq(rec.copy(updated = java.sql.Timestamp.from(now))).toDF())

  /** BOUNDED driver materialization behind every row-level Seq API:
    * collects at most limit+1 rows (the plan carries the limit, so the
    * scan stops early) and raises when the result would exceed the
    * bound instead of silently truncating — the caller either passes a
    * larger explicit limit or switches to the DataFrame twin. No
    * unbounded collect is reachable from this class's public surface. */
  private def toRecords(df: DataFrame, limit: Int): Seq[FileRecord] = {
    import MarcEncoders._
    // saturating +1: limit = Int.MaxValue must not wrap negative
    val fetch = if (limit >= Int.MaxValue) Int.MaxValue else limit + 1
    val rows = df.limit(fetch).as[FileRecord](fileRecordEncoder).collect().toSeq
    require(rows.length <= limit,
      s"row-level file API would collect more than $limit rows to the driver; " +
        "pass a larger limit explicitly or use the DataFrame twin (findByDateDf/findByIdentifierDf)")
    rows
  }

}

object FileStore {
  /** Default bound for the row-level Seq APIs (findByDate /
    * findByIdentifier): generous for interactive use, small enough
    * that a runaway range can't OOM the driver. Callers needing more
    * pass an explicit limit or the DataFrame twins. */
  val rowApiLimit: Int = 10000

  /** Filename encoding with the reference's char translation
    * `' /[]*:;'` -> `'__^^!#%'` (dlx/file/__init__.py:252-264);
    * stateless, so usable from executors (q103). */
  def encodeFn(identifiers: Seq[String], languages: Seq[String], extension: String): String = {
    languages.foreach(l => require(ISO6391.codes.contains(l.toLowerCase)))
    val table = Map(' ' -> '_', '/' -> '_', '[' -> '^', ']' -> '^', '*' -> '!', ':' -> '#', ';' -> '%')
    val ids = identifiers.map(_.map(c => table.getOrElse(c, c)).mkString)
    s"${ids.mkString("&")}-${languages.map(_.toUpperCase).mkString("-")}.$extension"
  }
}

object MarcEncoders {
  import org.apache.spark.sql.{Encoder, Encoders}
  implicit val fileRecordEncoder: Encoder[FileRecord] = Encoders.product[FileRecord]
}
