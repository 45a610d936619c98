ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdataplayeranalysisspark"
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
  "-Duser.timezone=UTC",
  // local[32] packs 32 executor threads into this one heap: at the old
  // 8g default each task's execution-memory share was ~125 MB, so any
  // multi-GB sort/agg (the 30x edge build's 72M-row window sort, q25's
  // verify at 10x) spilled by construction on a 128 GiB box. 32g keeps
  // a conservative 4x headroom for the OS page cache, the DuckDB oracle
  // process, and forked test JVMs while giving tasks ~1 GB each —
  // standard sizing for a 32-core single-node Spark deployment.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // A long-lived Spark JVM janino-compiles one generated class set per
  // plan shape; at the default 240m code cache a 134-query suite (plus
  // per-query warmup passes) can exhaust it, after which the JIT stops
  // compiling and everything runs interpreted — the r8 driver bench
  // recorded q82b at 2175 cpu-s vs 17.7 local from exactly this class
  // of degradation. Headroom + flushing keep compilation alive.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
