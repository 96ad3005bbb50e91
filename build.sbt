ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kaerspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Sources are UTF-8; without this scalac uses the platform charset
// (POSIX locale → ASCII), mangling non-ASCII string literals (the
// collation diacritic fold table) into replacement chars.
scalacOptions += "-encoding:UTF-8"
Test / fork := true
run / fork := true
// Forked run output must reach stdout RAW (no "[info] " logger prefix):
// the bench driver parses the single JSON line Bench prints, and sbt's
// default logger wrapping broke that parse in round 2 (BENCH_r02.json
// "parsed": null).
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
  "-Dfile.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g (r18): the local[32] suite at 8g ran GC-bound — the 25
  // slowest-gate subset measured 84.6 s (min-of-2) at 8g vs 75.5 s at
  // 24g (G1; ParallelGC at 24g was far worse, 123.6 s — G1 stays).
  // 32 concurrent tasks share the unified region, and the dedup/window
  // gates peak at 2-4 GB execution memory, so 8g left ~140 MB of
  // execution memory per task and paid it in collections. The box has
  // 128 GiB; a cluster deployment sizes spark.executor.memory the same
  // way (guide §5) — this is the local analogue, not a local-only trick.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // pre-size the heap: lazy expansion of a large -Xmx stalls the first
  // big-allocation queries for tens of seconds (measured: the sf1
  // suite's first levenshtein gate at 40 s vs 4.9 s steady-state).
  // AlwaysPreTouch dropped in r18: on this host first-touch of a 24g
  // heap runs ~90 s single-threaded at JVM start (measured with java
  // -version; 8g was 1.1 s), charged to every forked run — committing
  // without touching (-Xms=-Xmx, no pretouch) is 0.7 s and avoids the
  // G1 resize stalls the original fix targeted; demand-zeroing then
  // amortizes per page across the run.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Ad-hoc JVM flags for measurement experiments (GC algorithm A/Bs etc.)
// without editing this file per run: SPARK_GRAFT_JVM_EXTRA="-XX:..."
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
