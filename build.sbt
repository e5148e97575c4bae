ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pinterestdatapipeline218spark"
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
// The round driver invokes Bench via sbt and parses a JSON line from a
// ~2 KB stdout tail. sbt's default LoggedOutput prefixes every line of
// forked-process output with "[info] " and appends its own
// "[success] Total time: ..." line, so NO program line ever reaches the
// driver as parseable JSON (BENCH_r01..r09: parsed null every round,
// even with the sub-200-byte compact summary line present in the tail).
// StdoutOutput pipes the child's stdout through verbatim; showSuccess
// drops the trailing "[success]" line, so the process's last stdout line
// is exactly what the program printed last.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  // 24g (was 8g): local[32] means THIRTY-TWO executor tasks share this
  // one heap with the driver — at sf1 the 8g default left ~250 MB of
  // execution memory per sort task and intermittently OOMed
  // (UnsafeExternalSorter pointer-array growth; one fatal driver OOM
  // killed a whole bench run). The box has 128 GiB; in a real
  // deployment this is the executor-memory deploy knob, not code.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The ContextCleaner's periodic System.gc() (spark.cleaner
  // .periodicGC.interval — set by Bench/StreamStateBench to reclaim
  // shuffle files within a run) is otherwise a STOP-THE-WORLD full GC
  // of the 24g heap: measured r19 as 4-6 s pauses landing inside timed
  // batches, growing with heap fill and eventually hitting every
  // micro-batch. Concurrent explicit GC keeps the cleaner's weak-ref
  // processing without the pause.
  "-XX:+ExplicitGCInvokesConcurrent",
)
