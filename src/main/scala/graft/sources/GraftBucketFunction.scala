package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{
  BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The graft key-hash bucket function, exposed as a Spark V2 catalog
  * function: `bucket(numBuckets, key...)` = `pmod(xxhash64(key...), n)` —
  * by construction IDENTICAL to the write path's routing expression
  * ([[graft.table.CowTable]] `bucketExpr`), which is what makes it safe
  * for the planner to reason about the on-disk layout.
  *
  * This is the keystone of storage-partitioned joins (the Iceberg-style
  * SPJ arrangement): a scan over a bucketed graft table reports
  * `KeyGroupedPartitioning(bucket(n, keys), …)`; Spark resolves that
  * transform against the table's catalog (a [[GraftCatalog]], which
  * serves this function), and two sides whose bound functions share
  * [[Bound.canonicalName]] and bucket count are recognized as
  * co-partitioned — the join then runs with NO shuffle on either side.
  * `produceResult` is a real implementation (not just a marker), so
  * Spark can also hash-repartition a NON-graft side to match this
  * layout when `spark.sql.sources.v2.bucketing.shuffle.enabled` is on.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"

  override def description(): String =
    "bucket(numBuckets, key...): graft bucket id, pmod(xxhash64(key...), n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length >= 2,
      s"bucket(numBuckets, key...) needs at least 2 arguments, " +
        s"got ${inputType.length}")
    require(inputType.head.dataType == IntegerType,
      s"bucket() first argument must be INT numBuckets, " +
        s"got ${inputType.head.dataType.simpleString}")
    Bound(inputType.fields.map(_.dataType).toSeq)
  }

  /** Bound form: input rows are (numBuckets, key...). A case class so two
    * independently-bound instances over the same types compare equal —
    * part of what the planner's co-partition check requires.
    */
  final case class Bound(types: Seq[DataType])
    extends ScalarFunction[Integer] {

    override def inputTypes(): Array[DataType] = types.toArray
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false

    // the exact writer expression: xxhash64 (seed 42, same null/column
    // folding as functions.xxhash64) over the key columns, in key order
    @transient private lazy val hash = XxHash64(
      types.zipWithIndex.drop(1).map { case (t, i) =>
        BoundReference(i, t, nullable = true)
      }, 42L)

    override def produceResult(input: InternalRow): Integer = {
      val n = input.getInt(0)
      val m = (hash.eval(input).asInstanceOf[Long] % n).toInt
      if (m < 0) m + n else m
    }
  }
}
