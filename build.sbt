ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dlxspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked run's stdout through VERBATIM (no "[info] " log
// prefix): the round driver parses Bench's final stdout JSON line,
// and the sbt logger prefix has broken that parse three rounds in a
// row (BENCH_r0{2,3,4}.json "parsed": null).
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // cap, not allocation: the sandbox rig has 128 GiB; an 8g cap made
  // the x30 scale battery thrash (storage eviction + GC inflated
  // mid-battery queries up to 8x vs isolated runs — measured, see
  // SCALING.md). Override with SPARK_DRIVER_MEM when constrained.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Throughput collector (round 13, optimization guide §5): the bench
  // battery is pure batch — no latency SLO — and a back-to-back A/B on
  // one commit measured sum-of-min query walls 151.3 s (ParallelGC) vs
  // 173.1 s (default G1): G1's concurrent cycles + region management
  // tax every query a little, and the harness's explicit per-query
  // System.gc() full collections are markedly cheaper under Parallel.
  // JVM-level, not a local[32] tunable — any batch driver/executor JVM
  // of this workload gets the same trade. Override: SPARK_GRAFT_GC=
  // UseG1GC (or any -XX:+<collector> name).
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseParallelGC")}",
  // extra JVM flags for A/B runs (GC experiments etc.); inert when the
  // env var is unset
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
