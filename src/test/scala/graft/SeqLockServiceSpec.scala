package graft

import java.nio.file.Files
import org.scalatest.BeforeAndAfterAll
import graft.pgwire._

/** Unit spec for the r18 [[PgMeta.SeqLockService]] seam: the
  * cross-process half of sequence allocation is pluggable — the
  * default [[PgMeta.FileSeqLock]] is what PgMetaSpec's REAL two-JVM
  * draw race exercises; this spec covers the alternate
  * [[PgMeta.LocalSeqLock]] (single-writer deployments, the S3/HDFS
  * story) and the conf-driven selection.
  */
class SeqLockServiceSpec extends SparkSpec with BeforeAndAfterAll {

  private val metaDir = Files.createTempDirectory("graft-seqlock").toString
  private val session = new Session(82, "postgres", "postgres")
  private def run(sql: String): PgResult = Handlers.execute(spark, session, sql)

  override def afterAll(): Unit = {
    try {
      scala.util.Try(run("DROP SEQUENCE IF EXISTS slk_s1"))
      spark.conf.unset("spark.graft.seqLockService")
    } finally {
      PgMeta.setLockService(PgMeta.FileSeqLock)
      PgMeta.detach()
    }
    super.afterAll()
  }

  test("spark.graft.seqLockService selects the implementation at attach") {
    spark.conf.set("spark.graft.seqLockService", "local")
    PgMeta.attach(spark, metaDir)
    assert(PgMeta.currentLockService eq PgMeta.LocalSeqLock)
    PgMeta.detach()
    spark.conf.unset("spark.graft.seqLockService")
    PgMeta.attach(spark, metaDir)
    assert(PgMeta.currentLockService eq PgMeta.FileSeqLock)
    PgMeta.detach()
  }

  test("LocalSeqLock: concurrent same-JVM draws stay disjoint and gap-free") {
    spark.conf.set("spark.graft.seqLockService", "local")
    PgMeta.attach(spark, metaDir)
    assert(PgMeta.currentLockService eq PgMeta.LocalSeqLock)
    run("DROP SEQUENCE IF EXISTS slk_s1")
    run("CREATE SEQUENCE slk_s1")
    val threads = 8
    val perThread = 200
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = (1 to threads).map { t =>
        pool.submit(new java.util.concurrent.Callable[Seq[Long]] {
          def call(): Seq[Long] =
            (1 to perThread).map(_ => PgSequences.nextval("slk_s1", 100 + t))
        })
      }
      val all = futures.flatMap(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(all.size === threads * perThread)
      assert(all.toSet.size === all.size, "duplicate draws under LocalSeqLock")
      assert(all.toSet === (1L to (threads * perThread).toLong).toSet,
        "gaps in the drawn range")
    } finally pool.shutdownNow()
  }
}
