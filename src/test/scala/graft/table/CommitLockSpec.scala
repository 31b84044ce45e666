package graft.table

import java.util.concurrent.CyclicBarrier

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** Pins the OCC slot-lock honesty contract ([[CommitLocks]]): the local
  * claim primitive is create-exclusive under a REAL thread race, and
  * S3-family schemes refuse unless the deployment explicitly declares
  * conditional-create support or accepts best-effort single-writer
  * locking.
  */
class CommitLockSpec extends SparkSpec {
  import spark.implicits._

  test("slot claim admits exactly one winner under a 32-thread race") {
    val t = new CowTable(spark, tmpDir("locks"), keyCols = Seq("id"))
    t.bulkInsert(Seq((1L, "a")).toDF("id", "v"))
    (1 to 20).foreach { round =>
      val lock = new Path(s"${t.basePath}/_commits/.race$round.lock")
      val threads = 32
      val barrier = new CyclicBarrier(threads)
      val wins = new java.util.concurrent.atomic.AtomicInteger
      val pool = (1 to threads).map { _ =>
        new Thread(() => {
          barrier.await()
          if (t.claimSlot(lock)) wins.incrementAndGet()
        })
      }
      pool.foreach(_.start()); pool.foreach(_.join())
      assert(wins.get == 1, s"round $round: ${wins.get} claim winners")
    }
  }

  test("S3-family schemes refuse by default, with actionable guidance") {
    for (scheme <- Seq("s3", "s3a", "s3n"); mode <- Seq(None, Some("refuse"))) {
      val e = intercept[UnsupportedOperationException] {
        CommitLocks.checkScheme(scheme, mode)
      }
      assert(e.getMessage.contains("conditional") &&
        e.getMessage.contains(CommitLocks.ModeConf),
        s"$scheme/$mode error must name both opt-ins")
    }
  }

  test("explicit opt-ins and non-S3 schemes pass; unknown modes refuse") {
    CommitLocks.checkScheme("s3a", Some("conditional"))
    CommitLocks.checkScheme("s3a", Some("best-effort"))
    CommitLocks.checkScheme("s3a", Some("Best-Effort")) // case-insensitive
    for (scheme <- Seq(null, "file", "hdfs", "gs", "abfs"))
      CommitLocks.checkScheme(scheme, None)
    intercept[IllegalArgumentException] {
      CommitLocks.checkScheme("s3a", Some("yolo"))
    }
    ()
  }
}
