package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.sources.Layout

/** The original relation's [[FileIndex]] minus a set of skipped files —
  * a pure delegating view, so NOTHING is re-listed and partition
  * semantics are preserved exactly: Catalyst's partition pruning passes
  * its filters straight through to the underlying index, and envelope
  * skipping subtracts files from whatever partitions survive (the
  * composed production read path). `sizeInBytes` shrinks with the
  * skipped bytes so join-side broadcast estimates benefit from the
  * prune too.
  *
  * Shared by [[EnvelopePruneRule]] (automatic pruning of plain
  * `read.filter` scans) and [[Layout.prunedRead]] (the explicit-box
  * API): one code path, and — unlike re-reading the kept files as an
  * explicit path list — an O(1) driver-side relation spec at ANY file
  * count (a million-file table keeps one wrapped index, never a
  * million-element parquet path argument). */
private[graft] final class SkippingFileIndex(underlying: FileIndex, skip: Set[String],
    /** true iff the skip provably never changes plan RESULTS — the
      * [[EnvelopePruneRule]] case, where every skipped file fails the
      * still-present Filter above (I/O-only by the rule's soundness
      * contract). [[Layout.prunedRead]] passes false: there the
      * re-application of the box is the CALLER's obligation, so a plan
      * over it without the predicate genuinely means "kept files only"
      * and downstream rewrites must not see through it. */
    private[graft] val semanticsPreserving: Boolean = false)
    extends FileIndex {
  /** The wrapped index — the table's true listing (gate-of-record for
    * [[EnvelopeAggRule]]'s staleness check when `semanticsPreserving`). */
  private[graft] def base: FileIndex = underlying
  private def kept(p: org.apache.hadoop.fs.Path): Boolean =
    !skip.contains(Layout.normPath(p.toString))
  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = underlying.rootPaths
  override def partitionSchema: StructType = underlying.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = underlying.metadataOpsTimeNs
  override def refresh(): Unit = underlying.refresh()
  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => kept(f.getPath))))
      .filter(_.files.nonEmpty)
  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(f => kept(new org.apache.hadoop.fs.Path(f)))
  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).flatMap(_.files).map(_.getLen).sum
}
