package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Cluster-shaped smoke (r18 — VERDICT r17 stretch): run the Verify
  * main once under `local-cluster[2,4,4096]` — REAL separate executor
  * JVMs, not local-mode threads — over a representative operator
  * slice at sf0.001, proving the DATA PLANE carries no driver-JVM
  * closure assumptions end-to-end (PgMeta proved the metadata plane
  * in r17). A lambda capturing driver-side mutable state, a
  * non-serializable closure, or a driver-path-only file dependency
  * fails HERE and silently passes in local mode.
  *
  * The slice spans the operator families: columnar agg (q01),
  * banded MinHash dedup (q42), single-shuffle cosine pairs in-task
  * generator (q53), content-hash split (q64), multimodal header
  * parse (q90), single-shuffle semantic dedup (q131), training-order
  * shuffle+shard (q145). Full-surface cluster correctness is the
  * same Verify + DuckDB gate run manually with
  * SPARK_GRAFT_MASTER=local-cluster[2,4,4096].
  */
class ClusterSmokeSpec extends AnyFunSuite {

  test("Verify slice runs green under local-cluster (separate executor JVMs)") {
    val sfDir = "/root/testdata/sf0.001"
    assume(Files.isDirectory(java.nio.file.Paths.get(sfDir)),
      "testdata not present")
    val out = Files.createTempDirectory("graft-cluster-smoke").toString
    val queries = Seq("q01", "q42", "q53", "q64", "q90", "q131", "q145")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val log = Files.createTempFile("cluster-smoke", ".log")
    val cmd = Seq(javaBin, "-Xmx2g", "-cp", cp) ++ opens ++
      Seq("graft.Verify", sfDir, out) ++ queries
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_MASTER", "local-cluster[2,4,4096]")
    // the executor launcher reads SPARK_HOME's build layout; a bare
    // jars-only distribution needs the scala version pinned
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.environment().put("SPARK_GRAFT_CPUS", "8")
    val p = pb.redirectErrorStream(true).redirectOutput(log.toFile).start()
    assert(p.waitFor(8, java.util.concurrent.TimeUnit.MINUTES),
      s"cluster Verify timed out\n${tail(log)}")
    assert(p.exitValue() === 0, s"cluster Verify failed\n${tail(log)}")
    val spark = SparkSpec.session
    queries.foreach { q =>
      val dirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(q))
      assert(dirs.nonEmpty, s"$q produced no output dir\n${tail(log)}")
      dirs.foreach { d =>
        val n = spark.read.parquet(d.toString).count()
        assert(n > 0, s"${d.getName} is empty under local-cluster")
      }
    }
  }

  private def tail(log: java.nio.file.Path): String =
    scala.util.Try(new String(Files.readAllBytes(log), "UTF-8").takeRight(3000))
      .getOrElse("<no log>")
}
