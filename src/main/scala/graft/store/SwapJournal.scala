package graft.store

/** The stage-and-swap commit journal, shared by MarcStore and
  * FileStore (round-11 review: the protocol lived as two near-verbatim
  * copies, so a fix to one silently left the other unprotected).
  *
  * Protocol invariants enforced here:
  *  - the journal is written to a temp name, its data channel-forced
  *    to disk (fsync), then atomically renamed, and the STAGING
  *    DIRECTORY itself is forced afterwards — so after an OS/power
  *    crash the journal either exists with full content or not at
  *    all; a persisted-entry-with-torn-content state cannot present
  *    as a complete journal;
  *  - a malformed OR entry-less journal reads as ABSENT (roll back):
  *    every writer emits at least one line, so an empty file can only
  *    be torn-write debris;
  *  - roll-forward creates the live table dir before renaming staged
  *    buckets into it — a FRESH store whose very first commit crashed
  *    post-journal must recover to the new state, not fail the rename
  *    forever (the reopen-bricking bug this object fixed).
  *
  * DURABILITY BOUNDARY (the accepted contract, round-12 verdict #8):
  * the journal file itself is fsync'd (data + directory entry), so
  * crash-atomicity is EXACT for process death — the journal decides
  * roll-forward vs roll-back, and the staged parquet files a
  * roll-forward promotes were fully written before the journal write
  * began. The staged parquet FILES, however, are written by Spark's
  * normal output commit without an explicit per-file fsync pass, so
  * against OS/power loss the guarantee is the same as any Spark
  * FileOutputCommitter output: the rename-visible file set is
  * consistent, but very recent page-cache contents of staged files
  * could be lost with the journal surviving — in which case recovery
  * promotes a bucket whose parquet footer fails validation LOUDLY on
  * first read (parquet is self-checking), never silently. A
  * power-loss-paranoid deployment mounts the store on a filesystem
  * with ordered journaling (data=ordered ext4 / xfs default, which
  * flushes file data before the rename commits) or fsyncs staged
  * files out-of-band; the engine deliberately does not pay an
  * fsync-per-parquet-file pass on every commit.
  */
object SwapJournal {

  val FileName = "_commit_journal"

  /** Write `lines` as the staging dir's journal: tmp + fsync +
    * atomic rename + directory fsync. */
  def write(stagingPath: String, lines: Seq[String]): Unit = {
    val dir = java.nio.file.Paths.get(stagingPath)
    val tmp = dir.resolve(FileName + ".tmp")
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING,
      java.nio.file.StandardOpenOption.WRITE)
    try {
      ch.write(java.nio.ByteBuffer.wrap(lines.mkString("\n").getBytes("UTF-8")))
      ch.force(true)
    } finally ch.close()
    java.nio.file.Files.move(tmp, dir.resolve(FileName),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // persist the rename itself (directory entry) where the platform
    // allows opening a directory channel; best-effort elsewhere
    try {
      val dch = java.nio.channels.FileChannel.open(dir,
        java.nio.file.StandardOpenOption.READ)
      try dch.force(true) finally dch.close()
    } catch { case _: Exception => () }
  }

  /** Parse the staging dir's journal: Some(entries) only for a
    * present, well-formed, non-empty journal; None = roll back. */
  def read(stagingPath: String): Option[Seq[(String, Boolean)]] = {
    val journal = new java.io.File(stagingPath, FileName)
    if (!journal.exists()) return None
    try {
      val es = new String(java.nio.file.Files.readAllBytes(journal.toPath), "UTF-8")
        .split("\n").iterator.filter(_.nonEmpty)
        .map { l => val parts = l.split(","); (parts(0).trim, parts(1).trim == "1") }.toSeq
      if (es.isEmpty) None else Some(es)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Idempotently finish the bucket renames of a rolled-forward swap:
    * a staged dir that is gone was already moved; an entry journalled
    * hasData=0 means the commit emptied that bucket (delete path). */
  def rollForwardBuckets(stagingPath: String, tablePath: String,
      entries: Seq[(String, Boolean)]): Unit = {
    new java.io.File(tablePath).mkdirs() // fresh store: first swap may predate the dir
    for ((b, has) <- entries) {
      val src = new java.io.File(s"$stagingPath/id_bucket=$b")
      val dst = new java.io.File(s"$tablePath/id_bucket=$b")
      if (has) {
        if (src.exists()) {
          deleteRecursively(dst)
          require(src.renameTo(dst), s"recovery swap failed: $src -> $dst")
        }
      } else deleteRecursively(dst)
    }
  }

  /** rm -rf; shared by the stores and the gate scratch dirs. */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) { val fs = f.listFiles(); if (fs != null) fs.foreach(deleteRecursively) }
    if (f.exists()) f.delete(): Unit
  }

  /** A scratch dir removed at JVM exit (the gate-store idiom). */
  def scratchDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook { deleteRecursively(d.toFile) }
    d.toString
  }
}
