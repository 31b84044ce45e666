package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Nested (struct / array / map) payload columns through the table
  * lifecycle: the merge identity stays on top-level key columns, but the
  * payload must round-trip bulkInsert → upsert → delete → compaction and
  * the field-id machinery (ids are assigned per TOP-LEVEL field; parquet
  * propagates nested ids from the group id metadata only at top level —
  * renames are top-level-only, which the guards already enforce).
  */
class NestedTypesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int) = spark.range(n).select(
    col("id"),
    struct(concat(lit("n"), col("id")).as("name"),
      (col("id") * 2).as("score")).as("meta"),
    array(col("id"), col("id") + 1, col("id") + 2).as("xs"),
    map(lit("k"), col("id").cast("string")).as("attrs"))

  test("struct/array/map payloads round-trip upsert, delete, compaction") {
    val t = new CowTable(spark, tmpDir("nested"), keyCols = Seq("id"))
    t.bulkInsert(rows(100))
    // upsert replaces payloads for half the keys
    t.upsert(spark.range(50).select(col("id"),
      struct(lit("upd").as("name"), lit(-1L).as("score")).as("meta"),
      array(lit(9L)).as("xs"),
      map(lit("k"), lit("z")).as("attrs")))
    t.delete(spark.range(90, 100).toDF("id"))
    t.compact(maxFilesPerUnit = 1)
    val snap = t.snapshot()
    assert(snap.count() == 90)
    val updated = snap.filter($"id" === 10).select(
      $"meta.name", $"meta.score", $"xs", $"attrs.k").head
    assert(updated.getString(0) == "upd" && updated.getLong(1) == -1L)
    assert(updated.getSeq[Long](2) == Seq(9L))
    assert(updated.getString(3) == "z")
    val untouched = snap.filter($"id" === 70).select(
      $"meta.name", $"meta.score", size($"xs")).head
    assert(untouched.getString(0) == "n70" && untouched.getLong(1) == 140L)
    assert(untouched.getInt(2) == 3)
    // DSv2 read path + nested field pruning
    val viaSrc = spark.read.format("graft").load(t.basePath)
      .select($"meta.score").agg(sum($"score")).head.getLong(0)
    assert(viaSrc == snap.select(sum($"meta.score")).head.getLong(0))
    // a sibling payload column renames fine; the nested FIELD does not
    val t2 = t.renameColumn("xs", "elems")
    assert(t2.snapshot().filter($"id" === 10)
      .select($"elems").head.getSeq[Long](0) == Seq(9L))
  }
}
