package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe rewrite-and-swap for a parquet table DIRECTORY — the
  * maintenance primitive behind online compaction of append-accumulated
  * tables (the streaming near-dup sketch, the ANN `codes` index).
  *
  * Swap order: write `<dir>.compact-tmp/<uuid>` → rename live to
  * `<dir>.compact-backup` → rename tmp to live → delete backup. A crash
  * at ANY point leaves a complete copy under either the live or the
  * backup name (never delete-before-rename), and [[recover]] — run at
  * the start of every swap and before every read of a swap-maintained
  * table — heals each intermediate state deterministically from the
  * directory layout alone (no journal):
  *   - backup AND live exist → crash after promote: live is the newer
  *     complete copy, drop the backup;
  *   - backup exists, live missing → crash between the two renames:
  *     restore the backup (the tmp copy, though complete, is simply
  *     re-derivable — restoring the original is the conservative move);
  *   - tmp exists (any case) → a partial or superseded copy: drop it.
  *
  * Single-writer contract: the caller must be the table's only
  * writer/reader while the swap runs (the foreachBatch loops and the
  * index-maintenance verbs satisfy this by construction).
  *
  * ATOMIC-RENAME filesystems only: the crash-safety argument rests on
  * `fs.rename` being a metadata operation (local, HDFS, viewfs). On
  * object stores (S3A, GCS connector) rename is copy-then-delete, so a
  * crash mid-rename can leave PARTIAL copies under BOTH names — recover
  * would then drop the backup and keep a partial live table, silent data
  * loss. [[swapRewrite]] fails loudly on schemes outside the allowlist;
  * index/sketch tables on object stores need a different maintenance
  * primitive (e.g. a manifest-pointer swap). */
private[graft] object DirSwap {

  /** Schemes whose `rename` is atomic (a metadata move). `null` scheme =
    * the default FS, which in every deployment this library targets is
    * local or HDFS — both atomic. Other rename-atomic stores (abfs with
    * hierarchical namespace, o3fs, maprfs, …) opt in per session through
    * [[AtomicSchemesConf]] — the guard must not hard-fail deployments
    * whose filesystem genuinely renames atomically, but the OPERATOR
    * asserting that is a deployment fact this library can't probe, so
    * it's a conf, not a heuristic. */
  private val AtomicRenameSchemes = Set("file", "hdfs", "viewfs")

  /** Comma-separated extra URI schemes the operator asserts rename
    * atomically (e.g. `abfs,o3fs`). Appended to the built-in allowlist. */
  val AtomicSchemesConf = "spark.graft.dirswap.atomicSchemes"

  private[operators] def allowedSchemes(spark: SparkSession): Set[String] =
    AtomicRenameSchemes ++ spark.conf.get(AtomicSchemesConf, "")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty)

  private[operators] def requireAtomicRename(spark: SparkSession, path: org.apache.hadoop.fs.Path): Unit = {
    val allowed = allowedSchemes(spark)
    val scheme = path.toUri.getScheme
    require(scheme == null || allowed.contains(scheme.toLowerCase),
      s"DirSwap: $path uses scheme '$scheme', whose rename is not atomic (copy-then-delete " +
        "on object stores) - a crash mid-swap could leave partial copies under both names " +
        "and recover would keep a partial live table; swap-maintained tables require an " +
        s"atomic-rename filesystem (${allowed.mkString("/")}; rename-atomic stores can opt " +
        s"in via $AtomicSchemesConf)")
  }

  /** Rewrite the live table through `rewrite` (e.g. a repartition) into a
    * right-sized copy, then atomically-enough swap it in. Row-preserving
    * by contract of the callers (spec-pinned there).
    *
    * `retireTo`: when set (manifest-maintained tables), the replaced
    * generation's files are RETIRED — moved per-file into that
    * directory — instead of deleted, so a cross-process reader holding
    * the previous [[graft.sources.Manifest]] snapshot can still resolve
    * them; [[graft.sources.Manifest.vacuum]] bounds their lifetime.
    * When None (sketch/index compaction, non-manifest tables) the
    * backup is deleted as before. */
  def swapRewrite(spark: SparkSession, dir: String,
                  retireTo: Option[String] = None)(rewrite: DataFrame => DataFrame)(
      write: (DataFrame, String) => Unit): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    requireAtomicRename(spark, live)
    recover(spark, dir, retireTo)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(live), s"DirSwap: no table at $dir")
    // UNIQUE staging name UNDER a fixed-named staging dir: two writers
    // racing a swap (the optimistic-mutation model lets both reach
    // their index refresh before either commits) must never clobber
    // each other's in-flight Spark write — the loser's swap may still
    // fail at the renames, but a staging collision corrupting the
    // WINNER's output cannot happen. The fixed PARENT keeps [[recover]]
    // at two existence probes (a UUID-suffixed SIBLING would force an
    // O(entries) listing of the table's parent — for the envelope
    // index that parent is the table dir itself, a million entries at
    // scale) and keeps readHealed's `.compact-tmp`-suffix walk exact.
    val staging = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    val tmp = new org.apache.hadoop.fs.Path(
      staging, java.util.UUID.randomUUID().toString)
    val backup = new org.apache.hadoop.fs.Path(dir + ".compact-backup")
    write(rewrite(spark.read.parquet(dir)), tmp.toString)
    require(fs.rename(live, backup), s"DirSwap: could not move $live aside")
    require(fs.rename(tmp, live), s"DirSwap: could not promote $tmp")
    retireOrDelete(fs, backup, retireTo)
    // tidy the now-empty staging dir; non-empty (a concurrent writer's
    // in-flight staging) fails the non-recursive delete and is left for
    // that writer's swap or the next recover
    try { fs.delete(staging, false); () }
    catch { case _: java.io.IOException => () }
    ()
  }

  /** Heal an interrupted [[swapRewrite]]. Idempotent and cheap when there
    * is nothing to heal (two existence probes). Pass the same `retireTo`
    * the swap used: healing a post-promote crash must COMPLETE the
    * retirement (a delete would strand the previous manifest snapshot's
    * file set half-gone). */
  def recover(spark: SparkSession, dir: String,
              retireTo: Option[String] = None): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(dir + ".compact-backup")
    if (fs.exists(backup)) {
      if (fs.exists(live)) retireOrDelete(fs, backup, retireTo)
      else require(fs.rename(backup, live),
        s"DirSwap.recover: could not restore $backup to $live")
    }
    // staging leftovers: one fixed name covers both a crashed run's
    // UUID-child staging dir and the legacy flat-dir staging — one
    // existence probe, never a listing of the parent. A CONCURRENT
    // writer's live staging is inside too — deleting it fails that
    // writer's swap, never this one's, and callers racing swaps (the
    // envelope refresh) treat a failed refresh as stale-but-safe
    val staging = new org.apache.hadoop.fs.Path(dir + ".compact-tmp")
    if (fs.exists(staging)) fs.delete(staging, true)
    ()
  }

  /** Move every file under `backup` into the retirement dir —
    * RECURSIVELY, preserving relative structure, so even a table-level
    * swap of a hive-partitioned dir retires `wk=1/f.parquet` to
    * `<retired>/wk=1/f.parquet`, exactly where manifest snapshot
    * resolution probes — then drop the emptied backup; or plain-delete
    * when retirement is off. Idempotent under redo: already-moved files
    * are simply absent from the backup on the second pass. Name
    * collisions across generations cannot happen for Spark-written
    * files (task-UUID part names, and the sink's `b<id>-i` names are
    * unique per batch) — a collision fails loudly rather than silently
    * losing either generation. */
  private def retireOrDelete(fs: org.apache.hadoop.fs.FileSystem,
                             backup: org.apache.hadoop.fs.Path,
                             retireTo: Option[String]): Unit = retireTo match {
    case None => fs.delete(backup, true); ()
    case Some(rt) =>
      def move(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit = {
        fs.mkdirs(dst)
        fs.listStatus(src).foreach { s =>
          val d = new org.apache.hadoop.fs.Path(dst, s.getPath.getName)
          if (s.isDirectory) move(s.getPath, d)
          else {
            require(!fs.exists(d), s"DirSwap: retirement collision - $d already exists")
            require(fs.rename(s.getPath, d),
              s"DirSwap: could not retire ${s.getPath} to $d")
          }
        }
      }
      move(backup, new org.apache.hadoop.fs.Path(rt))
      fs.delete(backup, true)
      ()
  }
}
