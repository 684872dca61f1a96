ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpubdbspark"
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
// Pass forked stdout through verbatim (no "[info] " prefix): the bench
// driver machine-parses the final JSON line from the process tail, and
// sbt's default logger prefix broke that parse every round.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
// COUPLED LIST: the same opens live in tools/jrun.sh (plain-java
// driver) and graft.tools.ClusterConf (local-cluster executor JVMs) —
// a Spark upgrade needing another open must edit all three.
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
  // local[32] packs driver+executors into one JVM; 8g forced multi-
  // second full-GC pauses once the uncapped near-dup checkpoints plus
  // a 6M-row shuffle coexisted (measured: random 20 s spikes on
  // otherwise sub-second queries). The bench/verify box has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 165 whole-stage-codegen'd queries in one JVM overflow the default
  // 240m JIT code cache (flush storms deoptimize hot loops mid-suite)
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // forward golden-regeneration flag into the forked test JVM
  sys.props.get("graft.golden.update")
    .map(v => s"-Dgraft.golden.update=$v").toSeq
