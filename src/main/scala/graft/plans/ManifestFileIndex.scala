package graft.plans

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over an EXPLICIT, already-resolved file set — the
  * planning half of [[graft.sources.Manifest]] snapshots (the Delta
  * `TahoeLogFileIndex` role): the manifest decides which files exist,
  * this index serves them to Catalyst without ever listing the table
  * again, so a concurrent rewrite can neither add nor hide files from
  * the snapshot. One entry per leaf with its partition values already
  * materialized; `listFiles` evaluates Catalyst's partition filters
  * against those values (interpreted predicate over bound references —
  * the same construction Spark's own partitioning-aware index uses),
  * so partition pruning works on a snapshot exactly as on a live read.
  * Statuses carry the true lengths, so split planning and
  * `sizeInBytes`-driven broadcast decisions see real sizes. */
private[graft] final class ManifestFileIndex(
    root: Path,
    partSchema: StructType,
    partitions: Seq[(InternalRow, Seq[FileStatus])]) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(root)
  override def partitionSchema: StructType = partSchema
  override def refresh(): Unit = () // a snapshot never re-lists
  override def metadataOpsTimeNs: Option[Long] = None

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val survivors =
      if (partitionFilters.isEmpty || partSchema.isEmpty) partitions
      else {
        val bound = Predicate.createInterpreted(partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partSchema.fieldIndex(a.name)
            BoundReference(i, partSchema(i).dataType, nullable = true)
        })
        partitions.filter { case (values, _) => bound.eval(values) }
      }
    survivors.map { case (values, files) => PartitionDirectory(values, files.toArray) }
  }

  override def inputFiles: Array[String] =
    partitions.flatMap(_._2.map(_.getPath.toString)).toArray

  override lazy val sizeInBytes: Long = partitions.flatMap(_._2).map(_.getLen).sum
}
