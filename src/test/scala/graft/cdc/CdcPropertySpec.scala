package graft.cdc

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

case class PropEv(op: String, id: String, part: String, value: Double,
    transaction_id: String)

/** SURVEY.md §5(d): applying a random CDC log through the engine must equal
  * replaying it through a naive in-memory Map[key, row]. Deterministic
  * seeds, 8 random three-batch logs.
  */
class CdcPropertySpec extends SparkSpec {
  import spark.implicits._

  def genBatch(startTxn: Int): Gen[List[PropEv]] =
    Gen.choose(1, 25).flatMap { n =>
      Gen.listOfN(n, for {
        op <- Gen.oneOf("I", "U", "D")
        id <- Gen.choose(0, 19).map(i => s"k$i")
        v <- Gen.choose(0, 999).map(_.toDouble)
      } yield (op, id, v))
    }.map(_.zipWithIndex.map { case ((op, id, v), i) =>
      // partition derived from key (stable), txn monotonic within the log
      PropEv(op, id, s"p${id.hashCode.abs % 3}", v, f"${startTxn + i}%09d")
    })

  /** The naive oracle: fold the W1-deduped log into a Map. */
  def replay(state: Map[String, PropEv],
      batch: List[PropEv]): Map[String, PropEv] = {
    val latest = batch.groupBy(_.id).map { case (_, evs) =>
      evs.maxBy(_.transaction_id) }
    latest.foldLeft(state) { (s, e) =>
      e.op match {
        case "D" => s - e.id
        case _   => s + (e.id -> e)
      }
    }
  }

  val cfg = TableConfig(
    dbName = "prop", schemaName = "s", tableName = "t",
    primaryKey = "id", partitionKey = "part",
    precombineField = "value", glueJobName = "j")

  test("engine state == naive Map replay over random CDC logs") {
    checkReplay(cfg, seeds = 1 to 8)
  }

  test("bucketed tables satisfy the same replay property") {
    checkReplay(cfg.copy(tableName = "tb", numBuckets = 4), seeds = 21 to 24)
  }

  test("merge-on-read tables satisfy the same replay property") {
    checkReplay(cfg.copy(tableName = "tm", storageType = "mor"),
      seeds = 31 to 34)
  }

  private def checkReplay(cfg: TableConfig, seeds: Range): Unit = {
    val gen = for {
      b1 <- genBatch(0)
      b2 <- genBatch(1000)
      b3 <- genBatch(2000)
    } yield List(b1, b2, b3)

    seeds.foreach { seed =>
      val batches = gen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val wh = tmpDir("prop")
      val pipe = new CdcPipeline(spark, wh)
      // initial load: the first batch's latest non-delete image per key
      // (full loads in the reference carry no CDC columns)
      val init = batches.head.filter(_.op != "D")
        .groupBy(_.id).map(_._2.maxBy(_.transaction_id)).toList
      if (init.nonEmpty) {
        pipe.run(cfg, init.toDF().select($"id", $"part", $"value"))
        var expected: Map[String, PropEv] = init.map(e => e.id -> e).toMap
        batches.tail.foreach { b =>
          pipe.run(cfg, b.toDF())
          expected = replay(expected, b)
        }
        val table = pipe.tableFor(cfg)
        val got = table.snapshot()
          .select("id", "value").as[(String, Double)].collect().toMap
        val want = expected.map { case (k, e) => k -> e.value }
        assert(got == want, s"seed=$seed\n got=$got\n want=$want")
        table match {
          case m: graft.table.MorTable =>
            // folding the delta logs must not change the observable state
            m.compactLogs()
            val ro = m.readOptimized()
              .select("id", "value").as[(String, Double)].collect().toMap
            assert(ro == want, s"seed=$seed post-compaction\n got=$ro")
          case _ => ()
        }
      }
    }
  }
}
