package graft.tools

/** Git provenance stamp for committed benchmark artifacts.
  *
  * Rounds 6 and 7 both shipped BENCH_ and PLANS_ files generated from
  * a different commit than the one they were committed with (stale
  * plan pin in r6, pre-sweep fuzz artifacts in r7). Every artifact now
  * carries the HEAD it was generated from, and the verify recipe
  * (tools/stampcheck.py) refuses to commit an artifact whose stamp
  * differs from HEAD — the drift becomes mechanical instead of
  * forensic.
  *
  * The dirty check is scoped to the code paths (src/, build.sbt,
  * project/, tools/): the artifacts themselves are tracked files that
  * the generating run rewrites, so an unscoped `git status` would mark
  * every legitimate regeneration dirty.
  */
object GitStamp {
  private def run(cmd: String*): Option[String] =
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8).trim
      if (p.waitFor() == 0) Some(out) else None
    } catch { case _: Exception => None }

  lazy val sha: String = {
    val head = run("git", "rev-parse", "HEAD").getOrElse("unknown")
    val dirty = run("git", "status", "--porcelain", "--",
      "src", "build.sbt", "project", "tools").exists(_.nonEmpty)
    if (dirty) s"$head-dirty" else head
  }

  /** Ready-to-splice JSON member (leading comma included). */
  def jsonField: String = s""","git_sha":"$sha""""
}
