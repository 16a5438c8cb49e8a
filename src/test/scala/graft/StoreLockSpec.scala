package graft

import graft.store.StoreLock
import org.scalatest.funsuite.AnyFunSuite

/** The URI-scheme lock-bypass warning (round-13 verdict #3): a store
  * path with a `://` scheme has no OS file-lock tier, so the first
  * outermost acquisition must WARN — once per path, not per call —
  * and local paths must stay silent. Captures the actual log4j2
  * events rather than trusting a counter. */
class StoreLockSpec extends AnyFunSuite {

  private def captureWarns[A](loggerName: String)(body: => A): (A, Seq[String]) = {
    import org.apache.logging.log4j.{Level => L4JLevel}
    import org.apache.logging.log4j.core.LoggerContext
    import org.apache.logging.log4j.core.config.LoggerConfig
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.LogEvent
    val captured = scala.collection.mutable.ArrayBuffer.empty[String]
    val app = new AbstractAppender("storelock-spec-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit = captured.synchronized {
        captured += event.getMessage.getFormattedMessage
      }
    }
    app.start()
    val ctx = LoggerContext.getContext(false)
    val cfg = ctx.getConfiguration
    val lc = cfg.getLoggers.get(loggerName) match {
      case existing: LoggerConfig if existing.getName == loggerName => existing
      case _ =>
        val fresh = new LoggerConfig(loggerName, L4JLevel.WARN, true)
        cfg.addLogger(loggerName, fresh)
        fresh
    }
    lc.addAppender(app, L4JLevel.WARN, null)
    ctx.updateLoggers()
    try (body, captured.toSeq)
    finally { lc.removeAppender("storelock-spec-capture"); ctx.updateLoggers(); app.stop() }
  }

  test("URI store path warns exactly once per path; local paths never") {
    val uri = s"fake://bucket/store-${System.nanoTime()}"
    val uri2 = s"fake://bucket/other-${System.nanoTime()}"
    val local = java.nio.file.Files.createTempDirectory("storelock_spec").toString
    val before = StoreLock.uriWarnCount
    val (_, warns) = captureWarns("graft.store.StoreLock") {
      StoreLock.withLock(uri, 1000L)(())
      StoreLock.withLock(uri, 1000L)(())           // second acquire: silent
      StoreLock.withLock(uri, 1000L) {             // re-entrant: silent
        StoreLock.withLock(uri, 1000L)(())
      }
      StoreLock.withLock(local, 1000L)(())         // file-locked: silent
      StoreLock.withLock(uri2, 1000L)(())          // new path: warns again
    }
    val forUri = warns.filter(_.contains(uri))
    assert(forUri.size === 1, s"expected exactly one WARN for $uri, got: $warns")
    assert(forUri.head.contains("fenced externally"),
      "the warning must state the external-fencing requirement")
    assert(warns.count(_.contains(uri2)) === 1, "each distinct URI path warns once")
    assert(!warns.exists(_.contains(local)), "local paths have the file-lock tier")
    assert(StoreLock.uriWarnCount === before + 2)
  }
}
