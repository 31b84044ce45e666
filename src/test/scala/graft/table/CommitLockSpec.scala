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

  private def withObjectStoreDouble[T](mode: Option[String])(f: String => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[CondCreateS3Fs].getName)
    hc.set("fs.s3a.impl.disable.cache", "true")
    mode.foreach(spark.conf.set(CommitLocks.ModeConf, _))
    try f(s"s3a://graft-test${tmpDir("cond-occ")}")
    finally {
      spark.conf.unset(CommitLocks.ModeConf)
      hc.unset("fs.s3a.impl")
      hc.unset("fs.s3a.impl.disable.cache")
    }
  }

  test("conditional mode: racing writers complete via OCC rebase on the " +
      "object-store double, table state equals serial execution") {
    withObjectStoreDouble(Some("conditional")) { base =>
      def handle() = new CowTable(spark, base, keyCols = Seq("id"),
        partitionCols = Seq("p"), precombineField = "v")
      val t = handle()
      t.bulkInsert(Seq((1L, "p1", "a"), (2L, "p2", "b"))
        .toDF("id", "p", "v"))
      assert(t.manifest.version == 1L)
      // two independent handles racing DISJOINT-partition upserts through
      // the same version slot: the conditional create admits one, the
      // loser detects the taken slot and rebases
      val (t1, t2) = (handle(), handle())
      val barrier = new CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      def racer(tt: CowTable, rows: Seq[(Long, String, String)]) =
        new Thread(() =>
          try { barrier.await(); tt.upsert(rows.toDF("id", "p", "v")) }
          catch { case e: Throwable => errs.add(e) })
      val a = racer(t1, Seq((1L, "p1", "x")))
      val b = racer(t2, Seq((3L, "p2", "c")))
      a.start(); b.start(); a.join(); b.join()
      assert(errs.isEmpty, s"racers must both complete: ${errs.peek()}")
      val reread = handle()
      assert(reread.manifest.version == 3L,
        "both commits must land (one direct, one rebased)")
      assert(reread.manifest.metrics.contains("rebased_over"),
        "the loser must have rebased, not overwritten")
      val got = reread.snapshot().select("id", "v")
        .as[(Long, String)].collect().toMap
      assert(got == Map(1L -> "x", 2L -> "b", 3L -> "c"),
        "state must equal serial execution of both upserts")
    }
  }

  test("refuse mode blocks real commits on the object-store double") {
    withObjectStoreDouble(None) { base =>
      val t = new CowTable(spark, base, keyCols = Seq("id"))
      val e = intercept[UnsupportedOperationException] {
        t.bulkInsert(Seq((1L, "a")).toDF("id", "v"))
      }
      assert(e.getMessage.contains(CommitLocks.ModeConf))
    }
  }

  test("conditional create on the double admits one winner under a race") {
    withObjectStoreDouble(Some("conditional")) { base =>
      val t = new CowTable(spark, base, keyCols = Seq("id"))
      t.bulkInsert(Seq((1L, "a")).toDF("id", "v"))
      (1 to 10).foreach { round =>
        val lock = new Path(s"$base/_commits/.race$round.lock")
        val threads = 16
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
