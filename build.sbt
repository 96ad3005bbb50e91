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
  // 8g (r19): the r18 24g default was tuned on a WARM min-of-2 subset
  // (84.6 s at 8g vs 75.5 s at 24g on the 25-slowest-gate loop) and
  // regressed the driver's real contract — ONE cold pass at local[32]
  // — ~2x (driver r18: 845 s vs the r17 441 s band; G1 over a cold
  // 24g heap produced 10-30 s GC stalls on the checkpoint-heavy dedup
  // gates, and the 8-core probe beat 32 cores). Re-measured under the
  // cold contract with checkpoint blocks released at gate end
  // (GateScope): full 387-gate cold pass 381.6 s at 8g vs 439.2 s at
  // 24g vs 446.0 s at 12g on the idle 32-core box — the r18
  // motivation (execution-memory headroom) is obsolete once storage
  // no longer squats, and the smaller heap keeps G1 pauses ~1 s
  // suite-wide (gc_top in the bench total line). Guide §5: cut
  // retention first, size the heap second. G1 stays (r18: ParallelGC
  // was far worse).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // pre-size the heap: lazy expansion of a large -Xmx stalls the first
  // big-allocation queries for tens of seconds (measured: the sf1
  // suite's first levenshtein gate at 40 s vs 4.9 s steady-state).
  // Still no AlwaysPreTouch (r18): committing without touching is
  // ~0.7 s at JVM start and demand-zeroing of an 8g heap amortizes
  // invisibly across the run (pretouch itself was 1.1 s at 8g).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Ad-hoc JVM flags for measurement experiments (GC algorithm A/Bs etc.)
// without editing this file per run: SPARK_GRAFT_JVM_EXTRA="-XX:..."
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA")
  .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
