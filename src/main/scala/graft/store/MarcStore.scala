package graft.store

import graft.spark.{MarcContext, MarcRow, MarcSchema}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Batch storage layer: the Spark-native shape of the reference's
  * write path (Marc.commit / delete / restore / history / id counters,
  * dlx/marc/__init__.py:856-1310; SURVEY §3 EP3).
  *
  * One commit batch = one deterministic job:
  *   1. assign ids to new records (max_id + row_number — replaces the
  *      Mongo $inc counter; no shared counter needed in batch),
  *   2. MERGE into the live table (union + keep newest per _id),
  *   3. append one row per version to the history table,
  *   4. derived DataFrames (tag index, browse index, auth headings)
  *      recompute from the merged table — eviction falls out of the
  *      recompute (SURVEY §2.5 browse-index dedup row).
  *
  * At scale the live table is parquet partitioned by id-bucket; the
  * MERGE is a shuffle on _id only over the touched partitions (or a
  * Delta MERGE INTO where available). History is append-only.
  */
final class MarcStore(spark: SparkSession, basePath: String) {
  import spark.implicits._
  import MarcSchema.marcRowEncoder

  private def tablePath(recordType: String) = s"$basePath/${recordType}s"
  private def historyPath(recordType: String) = s"$basePath/${recordType}_history"

  def read(recordType: String): Dataset[MarcRow] = {
    val path = tablePath(recordType)
    if (!new java.io.File(path).exists())
      spark.emptyDataset[MarcRow]
    else spark.read.parquet(path).as[MarcRow]
  }

  def readHistory(recordType: String): DataFrame = {
    val path = historyPath(recordType)
    if (!new java.io.File(path).exists())
      spark.emptyDataset[MarcRow].toDF()
        .withColumn("version_no", lit(0L))
        .withColumn("action", lit(""))
        .limit(0)
    else spark.read.parquet(path)
  }

  /** max _id over live ∪ history (reference Marc.max_id,
    * dlx/marc/__init__.py:474-483). */
  def maxId(recordType: String): Long = {
    val live = read(recordType).select(col("_id"))
    val hist = readHistory(recordType).select(col("_id"))
    live.union(hist).agg(max("_id")).head().getAs[Any](0) match {
      case null => 0L
      case l: Long => l
      case other => other.toString.toLong
    }
  }

  /** ids for new records: max_id + row_number (reference
    * _increment_ids, dlx/marc/__init__.py:457-472, batch form). */
  def assignIds(recs: Dataset[MarcRow]): Dataset[MarcRow] = {
    val rt = recs.head().record_type
    val start = maxId(rt)
    val needIds = recs.filter(col("_id") === -1L)
      .withColumn("new_id", lit(start) + row_number().over(Window.orderBy(monotonically_increasing_id())))
      .withColumn("_id", col("new_id")).drop("new_id")
    recs.filter(col("_id") =!= -1L).unionByName(needIds.as[MarcRow])
  }

  /** Commit-time auth validation (reference auth_validate,
    * dlx/marc/__init__.py:890-904): controlled subfields must carry a
    * resolvable xref; uncontrolled subfields must not carry one. One
    * join job against the heading dimension. */
  private def authValidate(recs: Dataset[MarcRow], rt: String): Unit = {
    val controlledKeys = graft.config.DlxConfig.authorityControlled(rt)
      .flatMap { case (tag, codes) => codes.keys.map(c => s"$tag|$c") }.toSeq
    val subs = recs.toDF()
      .select(col("_id"), explode(col("datafields")).as("f"))
      .select(col("_id"), col("f.tag").as("tag"), explode(col("f.subfields")).as("s"))
      .select(col("_id"), col("tag"), col("s.code").as("code"), col("s.xref").as("xref"))
      .withColumn("ckey", concat(col("tag"), lit("|"), col("code")))
    val controlled = subs.where(col("ckey").isin(controlledKeys: _*))
    val uncontrolledWithXref = subs
      .where(!col("ckey").isin(controlledKeys: _*) && col("xref").isNotNull)
    val missingXref = controlled.where(col("xref").isNull)
    val headings = graft.spark.MarcContext.authHeadings(read("auth").toDF())
      .select(col("xref").as("h_xref"), col("code").as("h_code"))
    val badXref = controlled.where(col("xref").isNotNull)
      .join(headings, controlled("xref") === headings("h_xref") &&
        controlled("code") === headings("h_code"), "left_anti")
    val bad = uncontrolledWithXref.limit(1).collect() ++
      missingXref.limit(1).collect() ++ badXref.limit(1).collect()
    if (bad.nonEmpty) {
      val r = bad.head
      throw new IllegalArgumentException(
        s"Auth validation failed for $rt ${r.getAs[Long]("_id")} " +
          s"${r.getAs[String]("tag")}$$${r.getAs[String]("code")} xref=${r.getAs[Any]("xref")}")
    }
  }

  /** Upsert a batch: keep the incoming row for each _id, keep
    * untouched rows, stamp audit columns, append history. */
  def commit(recs: Dataset[MarcRow], user: String,
      now: java.sql.Timestamp = java.sql.Timestamp.from(java.time.Instant.now()),
      authCheck: Boolean = false): Unit = {
    val rt = recs.head().record_type
    if (authCheck) authValidate(recs, rt)
    val live = read(rt)
    val incomingRaw = assignIds(recs)

    // audit columns: preserve created/created_user from previous state
    val prev = live.select(col("_id").as("p_id"), col("created").as("p_created"),
      col("created_user").as("p_created_user"))
    val incoming = incomingRaw
      .join(prev, incomingRaw("_id") === prev("p_id"), "left")
      .withColumn("created", coalesce(col("p_created"), lit(now)))
      .withColumn("created_user", coalesce(col("p_created_user"), lit(user)))
      .withColumn("updated", lit(now))
      .withColumn("user", lit(user))
      .drop("p_id", "p_created", "p_created_user")
      .as[MarcRow]
      // cut lineage: the plan must not re-read the live table after
      // the atomic swap below replaces its files
      .localCheckpoint(true)

    val merged = live.join(incoming.select(col("_id").as("i_id")),
        live("_id") === col("i_id"), "left_anti")
      .as[MarcRow]
      .unionByName(incoming)

    writeTable(merged.toDF(), tablePath(rt))
    appendHistory(incoming.toDF(), rt, "commit", now)
  }

  /** Delete ids; refuse when an auth is still referenced (AuthInUse
    * guard, dlx/marc/__init__.py:1243-1252). */
  def delete(recordType: String, ids: Seq[Long],
      now: java.sql.Timestamp = java.sql.Timestamp.from(java.time.Instant.now())): Unit = {
    if (recordType == "auth") {
      val inUse = MarcContext.authUseCounts(read("bib").toDF().unionByName(read("auth").toDF()))
        .where(col("xref").isin(ids: _*))
        .count()
      require(inUse == 0, s"Auth record(s) in use: cannot delete")
    }
    val live = read(recordType)
    // stamp the deletion time on the history marker (reference records
    // deleted.user/time, dlx/marc/__init__.py:1288-1308)
    val deleted = live.filter(col("_id").isin(ids: _*)).toDF()
      .withColumn("updated", lit(now)).localCheckpoint(true)
    writeTable(live.filter(!col("_id").isin(ids: _*)).toDF(), tablePath(recordType))
    appendHistory(deleted, recordType, "deleted", now)
  }

  /** Recreate the last history version of a deleted record
    * (Marc.restore, dlx/marc/__init__.py:581-590). */
  def restore(recordType: String, id: Long, user: String): Unit = {
    val hist = readHistory(recordType).where(col("_id") === id)
      .orderBy(col("version_no").desc).limit(1)
      .drop("version_no", "action")
      .localCheckpoint(true)
    require(!hist.isEmpty, s"History for $recordType $id not found")
    commit(hist.as[MarcRow], user)
  }

  /** History.from_query analog (dlx/marc/__init__.py:2345-2354): run
    * a search-string query against the version records. */
  def queryHistory(recordType: String, query: String): DataFrame = {
    val hist = readHistory(recordType)
    val compiler = new graft.spark.SparkQueryCompiler(spark,
      hist.drop("version_no", "action"), read("auth").toDF())
    hist.where(compiler.compile(graft.query.QueryParser.parse(query, recordType)))
  }

  /** Deleted record ids matching a query (History.find_deleted). */
  def findDeleted(recordType: String, query: String): DataFrame =
    queryHistory(recordType, query).where(col("action") === "deleted").select("_id").distinct()

  /** Deleted record ids in a time window (History.deleted_by_date). */
  def deletedByDate(recordType: String, from: java.time.Instant, to: java.time.Instant): DataFrame =
    readHistory(recordType)
      .where(col("action") === "deleted" &&
        col("updated") >= lit(java.sql.Timestamp.from(from)) &&
        col("updated") < lit(java.sql.Timestamp.from(to)))
      .select("_id").distinct()

  /** Record state at a given version (1-based, oldest first) — the
    * reference's in-memory Marc.revert (dlx/marc/__init__.py:1349-1366)
    * as a history read. */
  def revert(recordType: String, id: Long, version: Long): MarcRow = {
    val rows = readHistory(recordType)
      .where(col("_id") === id && col("version_no") === version)
      .drop("version_no", "action")
      .as[MarcRow].collect()
    require(rows.nonEmpty, s"History version $version of $recordType $id does not exist")
    rows.head
  }

  /** One row per version (exploded history array — SURVEY §1.4). */
  private def appendHistory(batch: DataFrame, recordType: String,
      action: String, now: java.sql.Timestamp): Unit = {
    val existing = readHistory(recordType)
    val counts =
      if (existing.isEmpty) batch.select(col("_id").as("h_id")).distinct().withColumn("prev_versions", lit(0L))
      else existing.groupBy(col("_id").as("h_id")).agg(count(lit(1)).as("prev_versions"))
    val versioned = batch
      .join(counts, batch("_id") === counts("h_id"), "left")
      .withColumn("version_no", coalesce(col("prev_versions"), lit(0L)) + 1)
      .withColumn("action", lit(action))
      .drop("h_id", "prev_versions")
    val combined = if (existing.isEmpty) versioned else existing.unionByName(versioned)
    writeTable(combined, historyPath(recordType))
  }

  /** Parquet "MERGE": stage to a temp dir, then swap (single-node
    * test layout; Delta MERGE INTO / partition overwrite at scale). */
  private def writeTable(df: DataFrame, path: String): Unit = {
    val tmp = path + "_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val target = new java.io.File(path)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(target)
    }
    new java.io.File(tmp).renameTo(target)
    // the swap invalidates Spark's cached file listing for the path
    spark.catalog.refreshByPath(path)
  }
}
