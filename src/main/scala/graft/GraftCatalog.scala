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

  /** Optional WAREHOUSE-LEVEL registry: a file path. When set, names
    * registered through the SQL DDL (`CREATE TABLE … USING graft`)
    * persist here and a FRESH session pointing the same conf at the
    * same file resolves them — the catalog story past session scope
    * without requiring a metastore. Format: one URL-encoded
    * `name=dir` line per table (names stored lowercased); writes go
    * through a temp file + rename and are LAST-WRITER-WINS per file —
    * the registry is a name→location map, not a transaction log (table
    * state itself is always the manifest's). Reads are cached by the
    * file's (mtime, length), so per-query resolution is an fs.stat. */
  val RegistryConf = "spark.graft.catalog.registry"

  private def key(name: String): String = Prefix + name.toLowerCase

  private val NamePattern = "[A-Za-z_][A-Za-z0-9_]*"

  // ---- warehouse-level registry -----------------------------------

  private val regCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Map[String, String])]()

  /** The configured registry file, if any. */
  def registryPath(spark: SparkSession): Option[String] =
    spark.conf.getOption(RegistryConf).filter(_.nonEmpty)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All persisted registrations (empty when no registry is configured
    * or the file does not exist yet). */
  def registryNames(spark: SparkSession): Map[String, String] =
    registryPath(spark).map(readRegistry(spark, _)).getOrElse(Map.empty)

  private def readRegistry(spark: SparkSession, path: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) return Map.empty
    val st = fs.getFileStatus(p)
    val hit = regCache.get(path)
    if (hit != null && hit._1 == st.getModificationTime && hit._2 == st.getLen)
      return hit._3
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val m = text.split("\n").iterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
        val i = l.indexOf('=')
        require(i > 0, s"graft catalog registry $path: malformed line '$l'")
        java.net.URLDecoder.decode(l.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(l.drop(i + 1), "UTF-8")
      }.toMap
    regCache.put(path, (st.getModificationTime, st.getLen, m))
    m
  }

  private def writeRegistry(spark: SparkSession, path: String,
                            m: Map[String, String]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = fsOf(spark, p)
    if (p.getParent != null) fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID().toString)
    val body = ("# graft table registry: name=dir, URL-encoded\n" +
      m.toSeq.sortBy(_._1).map { case (n, d) =>
        java.net.URLEncoder.encode(n, "UTF-8") + "=" +
          java.net.URLEncoder.encode(d, "UTF-8")
      }.mkString("", "\n", "\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = fs.create(tmp, true)
    try out.write(body) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"graft catalog registry: could not move $tmp into place at $path")
    regCache.remove(path)
  }

  /** [[register]] plus persistence into the configured registry file
    * (requires [[RegistryConf]] to be set) — what the SQL DDL uses when
    * a registry is configured. */
  def registerPersistent(spark: SparkSession, name: String, dir: String): Unit = {
    val path = registryPath(spark).getOrElse(throw new IllegalStateException(
      s"GraftCatalog.registerPersistent: $RegistryConf is not set - set it to a " +
        "registry file path, or use session-scoped register()"))
    register(spark, name, dir)
    writeRegistry(spark, path, readRegistry(spark, path) + (name.toLowerCase -> dir))
  }

  /** [[unregister]] plus removal from the configured registry file (a
    * no-op on the file when no registry is configured). */
  def unregisterPersistent(spark: SparkSession, name: String): Unit = {
    unregister(spark, name)
    registryPath(spark).foreach { path =>
      val m = readRegistry(spark, path)
      if (m.contains(name.toLowerCase))
        writeRegistry(spark, path, m - name.toLowerCase)
    }
  }

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
      .orElse(registryNames(spark).get(name.toLowerCase))

  /** Resolve a TVF's path-or-name argument: a registered name maps to
    * its directory, anything else (in particular anything with a path
    * separator) passes through unchanged. */
  def resolve(spark: SparkSession, pathOrName: String): String =
    if (pathOrName.contains('/')) pathOrName
    else dirOf(spark, pathOrName).getOrElse(pathOrName)

  /** Every resolvable registration — the persisted registry overlaid
    * with this session's conf entries (conf wins on a collision,
    * matching [[dirOf]]'s lookup order). Keys are as stored:
    * [[register]] lowercases; a pure-SQL `SET` keeps its spelling. */
  def registrations(spark: SparkSession): Map[String, String] =
    registryNames(spark) ++ spark.conf.getAll.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }
}
