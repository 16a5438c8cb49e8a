package graft.tools

/** Shared child-JVM launcher for tools that need a FRESH process
  * (IsolatedBench's cold-JVM walls, StoreStress's cross-process
  * contention race): same classpath as this process plus the sbt
  * fork's JDK-17 add-opens set — previously copy-pasted per tool
  * (and a third time in build.sbt, which stays authoritative for the
  * sbt fork itself). */
object ChildJvm {

  /** Matches org.apache.spark.launcher.JavaModuleOptions — what
    * spark-submit would inject; required when a SparkSession is built
    * in a bare `java` process on JDK 17. */
  val addOpens: Seq[String] = Seq(
    "java.base/java.io", "java.base/java.lang",
    "java.base/java.lang.invoke", "java.base/java.lang.reflect",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  /** `java <add-opens> -Xmx<heap> -cp <this process's classpath>
    * <main> <args...>`. */
  def cmd(maxHeap: String, mainAndArgs: Seq[String]): Seq[String] =
    Seq(s"${sys.props("java.home")}/bin/java") ++ addOpens ++ Seq(
      s"-Xmx$maxHeap", "-Dspark.ui.enabled=false",
      "-cp", sys.props("java.class.path")) ++ mainAndArgs
}
