package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{
  Expression => VExpression, Expressions}
import org.apache.spark.sql.connector.metric.CustomMetric
import org.apache.spark.sql.connector.expressions.{
  SortDirection, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.read.{
  Batch, HasPartitionKey, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, Statistics, SupportsReportOrdering,
  SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{
  FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.FileScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

import graft.table.CowTable

/** Bucket-aware scan over a bucketed graft table: regroups the native
  * parquet scan's input splits by the table's `__bucket=N` layout and
  * reports `KeyGroupedPartitioning(bucket(n, keys))` — the storage half
  * of a STORAGE-PARTITIONED JOIN. Two graft tables bucketed the same way
  * on the same key type then join with no shuffle on either side:
  * at 100 TB the single biggest cost of a fact-to-fact join (two full
  * network re-partitions) disappears, because the write path already
  * clustered both tables by join key.
  *
  * Engaged only under `spark.sql.sources.v2.bucketing.enabled=true`
  * (the same opt-in Spark's own SPJ machinery is gated on) — otherwise
  * the builder serves the plain size-split parquet scan, so standalone
  * reads of bucketed tables keep their full split parallelism.
  *
  * All actual reading delegates to the wrapped parquet scan's reader
  * factory (vectorized, codegen'd columns, pushed filters intact);
  * only the SPLIT GROUPING and the reported partitioning differ.
  * Reported statistics pass through, so join-side broadcast decisions
  * are unchanged.
  */
final case class GraftBucketScan(
    inner: FileScan,
    numBuckets: Int,
    keyCols: Seq[String],
    /** The table's `clusterCols` (intra-file sort order from the write
      * path) — the basis for reported per-partition ordering. Empty =
      * files are not known-sorted, no ordering claimed.
      */
    clusterCols: Seq[String] = Nil,
    /** Manifest-relative paths of files whose in-file order is NOT
      * clusterCols (a Z-order rewrite produced them): a partition built
      * on such a file claims no ordering — a sort-merge join must keep
      * its sorts over z-sorted rows.
      */
    unorderedFiles: Seq[String] = Nil)
  extends Scan with Batch
  with SupportsReportPartitioning with SupportsReportStatistics
  with SupportsReportOrdering {

  override def readSchema(): StructType = inner.readSchema()

  override def toBatch: Batch = this

  override def description(): String =
    s"GraftBucketScan(numBuckets=$numBuckets, " +
      s"keys=${keyCols.mkString(",")}) ${inner.description()}"

  override def estimateStatistics(): Statistics = inner.estimateStatistics()

  override def supportedCustomMetrics(): Array[CustomMetric] =
    inner.supportedCustomMetrics()

  private def bucketOf(path: String): Int = {
    val seg = "/" + CowTable.DirColPrefix + CowTable.BucketCol + "="
    val i = path.indexOf(seg)
    require(i >= 0, s"bucketed graft file without a bucket segment: $path")
    val from = i + seg.length
    val to = path.indexOf('/', from)
    path.substring(from, if (to < 0) path.length else to).toInt
  }

  /** One group per populated bucket (empty buckets simply don't appear;
    * Spark's push-part-values handling aligns value mismatches between
    * join sides). Grouping whole buckets trades split granularity for
    * co-partition: with SPJ engaged the task unit IS the bucket.
    */
  @transient private lazy val grouped: Array[(Int, Array[PartitionedFile])] =
    inner.toBatch.planInputPartitions()
      .flatMap { case fp: FilePartition => fp.files }
      .groupBy(f => bucketOf(f.filePath.toString))
      .toArray.sortBy(_._1)

  override def planInputPartitions(): Array[InputPartition] =
    grouped.zipWithIndex.map { case ((b, fs), i) =>
      GraftBucketPartition(i, b, fs)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftBucketReaderFactory(inner.toBatch.createReaderFactory())

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array[VExpression](Expressions.bucket(numBuckets, keyCols: _*)),
      grouped.length)

  /** Per-partition ordering: claimed ONLY when it provably holds —
    * the write path sorts rows within each file by `clusterCols`
    * (bucket dir col leads the sort but is constant within a bucket),
    * so a partition is ordered iff it is ONE file's splits in offset
    * order. Multi-file buckets (pre-compaction) claim nothing: two
    * sorted files concatenated are not sorted. With ordering reported
    * and SPJ engaged, a sort-merge join of two co-bucketed key-sorted
    * tables runs with NO exchange AND NO sort on either side — the
    * classic bucketed-sorted-table join, at 100 TB the difference
    * between a join bounded by scan speed and one bounded by two full
    * shuffles plus two spilled sorts.
    */
  override def outputOrdering(): Array[VSortOrder] = {
    // relative-path suffix match: split paths are absolute (scheme-
    // qualified), manifest entries are basePath-relative
    def unordered(path: String): Boolean =
      unorderedFiles.exists(r => path.endsWith("/" + r) || path == r)
    val sorted = clusterCols.nonEmpty && grouped.forall { case (_, fs) =>
      fs.map(_.filePath.toString).distinct.length == 1 &&
        fs.sortBy(_.start).sameElements(fs) &&
        !unordered(fs.head.filePath.toString)
    }
    if (!sorted) Array.empty
    else clusterCols.map(c => Expressions.sort(
      Expressions.column(c), SortDirection.ASCENDING): VSortOrder).toArray
  }
}

/** A bucket's worth of parquet splits, keyed for Spark's key-grouped
  * partition matching.
  */
final case class GraftBucketPartition(
    index: Int,
    bucketId: Int,
    files: Array[PartitionedFile])
  extends InputPartition with HasPartitionKey {

  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))

  override def preferredLocations(): Array[String] =
    FilePartition(index, files).preferredLocations()
}

/** Delegates to the native parquet reader factory, re-wrapping each
  * bucket partition as the [[FilePartition]] the delegate expects —
  * vectorized reading and filter evaluation are untouched.
  */
private[sources] class GraftBucketReaderFactory(
    delegate: PartitionReaderFactory)
  extends PartitionReaderFactory {

  private def fp(p: InputPartition): InputPartition = p match {
    case g: GraftBucketPartition => FilePartition(g.index, g.files)
    case other => other
  }

  override def createReader(
      p: InputPartition): PartitionReader[InternalRow] =
    delegate.createReader(fp(p))

  override def createColumnarReader(
      p: InputPartition): PartitionReader[ColumnarBatch] =
    delegate.createColumnarReader(fp(p))

  override def supportColumnarReads(p: InputPartition): Boolean =
    delegate.supportColumnarReads(fp(p))
}
