package graft

import org.apache.spark.sql.SparkSession

import graft.sources.Manifest

/** NAMED-TABLE surface for manifest-maintained parquet tables — the
  * light session catalog: everything else in the library is
  * path-addressed (``parquet.`dir` ``, TVF path arguments), which is
  * honest but verbose; registering a name lets `spark.table("docs")`,
  * SQL `FROM docs`, `DELETE FROM docs` / `UPDATE docs` / `MERGE INTO
  * docs`, and every path-taking graft TVF speak the name instead.
  *
  * {{{
  *   GraftCatalog.register(spark, "docs", "/warehouse/docs")
  *   spark.table("docs").count()
  *   spark.sql("DELETE FROM docs WHERE doc_id BETWEEN 5 AND 9")
  *   spark.sql("SELECT * FROM graft_table_stats('docs')")
  * }}}
  *
  * Registrations are SESSION-SCOPED conf entries
  * (`spark.graft.table.<name> = dir`), so they survive
  * `session.cloneSession()`, are visible to every injected rule without
  * shared mutable state, and can equally be made in pure SQL
  * (`SET spark.graft.table.docs=/warehouse/docs`) or on the submit
  * command line (`--conf`). Resolution order follows Spark's: a real
  * catalog table or temp view with the same name wins (the analyzer
  * resolves those before extension rules run); the graft name only
  * binds otherwise. Reads through a name are SNAPSHOT reads
  * ([[Manifest.read]] — the latest committed manifest, deletion vectors
  * applied), resolved FRESH per query: a name is never a stale plan. */
object GraftCatalog {

  /** Session-conf prefix a registration lives under. */
  val Prefix = "spark.graft.table."

  private def key(name: String): String = Prefix + name.toLowerCase

  private val NamePattern = "[A-Za-z_][A-Za-z0-9_]*"

  /** Register `name` → `dir` in this session. The table must be (or
    * becomes) manifest-maintained: a plain parquet dir gets its first
    * manifest committed here, so the name always serves a consistent
    * snapshot. Re-registering a name overwrites it. */
  def register(spark: SparkSession, name: String, dir: String): Unit = {
    require(name.matches(NamePattern),
      s"GraftCatalog.register: '$name' is not a plain SQL identifier ($NamePattern)")
    if (Manifest.latestSeq(spark, dir).isEmpty) Manifest.write(spark, dir)
    spark.conf.set(key(name), dir)
  }

  /** Drop a registration (the table itself is untouched). */
  def unregister(spark: SparkSession, name: String): Unit =
    spark.conf.unset(key(name))

  /** The directory a registered name points at, if any. Looks up the
    * canonical (lowercased) key first, then the verbatim spelling — a
    * pure-SQL registration (`SET spark.graft.table.MixedCase=dir`)
    * stores its key verbatim, and a name that resolved when registered
    * must keep resolving when queried. */
  def dirOf(spark: SparkSession, name: String): Option[String] =
    if (!name.matches(NamePattern)) None
    else spark.conf.getOption(key(name))
      .orElse(spark.conf.getOption(Prefix + name))

  /** Resolve a TVF's path-or-name argument: a registered name maps to
    * its directory, anything else (in particular anything with a path
    * separator) passes through unchanged. */
  def resolve(spark: SparkSession, pathOrName: String): String =
    if (pathOrName.contains('/')) pathOrName
    else dirOf(spark, pathOrName).getOrElse(pathOrName)
}
