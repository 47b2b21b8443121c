package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedTable}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructField, StructType}

import graft.GraftCatalog
import graft.sources.Manifest

/** SQL DDL for the graft named-table surface — the parser face of
  * [[GraftCatalog]]:
  *
  * {{{
  *   CREATE TABLE docs USING graft LOCATION '/warehouse/docs'
  *   CREATE TABLE docs2 USING graft LOCATION '/warehouse/docs2'
  *     AS SELECT * FROM src
  *   DROP TABLE docs
  * }}}
  *
  * Injected as a PARSER extension (the Delta pattern): `USING graft` is
  * not a registered DataSource class, so letting the statement reach
  * the analyzer's session-catalog resolution would fail on provider
  * lookup — the parser delegates everything to Spark's parser and then
  * rewrites exactly the graft shapes into RunnableCommands (side effect
  * at execution, like the mutation DDL). Semantics:
  *
  *   - CREATE registers `name → location` — EXTERNAL-table semantics
  *     over a manifest-maintained (or plain parquet, first manifest
  *     committed on registration) directory. No column list is
  *     accepted: the schema is the manifest's, pinned by the data
  *     (a list would either lie or duplicate it). Names are single-part
  *     or `graft.name`.
  *   - CTAS writes the query result to LOCATION (which must not
  *     already hold a table), commits the first manifest, registers.
  *   - DROP unregisters the name; the table directory is untouched
  *     (external semantics — `PURGE` therefore declines loudly). Only
  *     names the graft catalog holds are intercepted; everything else
  *     keeps Spark's stock behavior.
  *
  * With [[GraftCatalog.RegistryConf]] set, CREATE/DROP persist into the
  * warehouse-level registry file, so a FRESH session configured with
  * the same registry resolves the name; otherwise registrations are
  * session-conf-scoped. */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    transform(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
      parameters: ParameterContext): LogicalPlan =
    transform(delegate.parsePlanWithParameters(sqlText, parameters))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  private def isGraft(spec: TableSpecBase): Boolean = spec match {
    case u: UnresolvedTableSpec => u.provider.exists(_.equalsIgnoreCase("graft"))
    case t: TableSpec => t.provider.exists(_.equalsIgnoreCase("graft"))
    case _ => false
  }

  private def locationOf(spec: TableSpecBase): Option[String] = spec match {
    case u: UnresolvedTableSpec => u.location
    case t: TableSpec => t.location
    case _ => None
  }

  /** Single-part or `graft.`-qualified name, else a loud graft-aware
    * error (never a silent fall-through for a statement that named the
    * graft provider explicitly). */
  private def nameOf(parts: Seq[String], stmt: String): String = parts match {
    case Seq(n) => n
    case Seq(ns, n) if ns.equalsIgnoreCase("graft") => n
    case other => throw new UnsupportedOperationException(
      s"$stmt USING graft: name '${other.mkString(".")}' must be a single " +
        "identifier or graft.<name> - graft registrations are a flat " +
        "name -> location map, not a database tree")
  }

  private def transform(plan: LogicalPlan): LogicalPlan = plan match {
    case CreateTable(UnresolvedIdentifier(parts, _), columns, partitioning,
        spec, ifNotExists) if isGraft(spec) =>
      val name = nameOf(parts, "CREATE TABLE")
      if (columns.nonEmpty) throw new UnsupportedOperationException(
        s"CREATE TABLE $name USING graft: a column list is not supported - the " +
          "schema is the manifest's, pinned by the table's data (an empty table " +
          "is not representable in a manifest; use CTAS to create one with rows)")
      if (partitioning.nonEmpty) throw new UnsupportedOperationException(
        s"CREATE TABLE $name USING graft: PARTITIONED BY is not supported here - " +
          "partitioning is physical layout, owned by the writer " +
          "(Layout.clusterWrite / partitionBy at write time)")
      val loc = locationOf(spec).getOrElse(throw new UnsupportedOperationException(
        s"CREATE TABLE $name USING graft requires LOCATION '<table dir>' - a " +
          "graft table IS its directory (manifest + data files)"))
      GraftCreateTableCommand(name, loc, ifNotExists)
    case c @ CreateTableAsSelect(UnresolvedIdentifier(parts, _), partitioning,
        query, spec, _, ifNotExists, _) if isGraft(spec) =>
      val name = nameOf(parts, "CREATE TABLE")
      if (partitioning.nonEmpty) throw new UnsupportedOperationException(
        s"CREATE TABLE $name USING graft AS SELECT: PARTITIONED BY is not " +
          "supported - write with Layout.clusterWrite / partitionBy, then " +
          "CREATE TABLE ... LOCATION over the result")
      val loc = locationOf(spec).getOrElse(throw new UnsupportedOperationException(
        s"CREATE TABLE $name USING graft AS SELECT requires LOCATION '<dir>' - " +
          "a graft table IS its directory"))
      if (c.writeOptions.nonEmpty) throw new UnsupportedOperationException(
        s"CREATE TABLE $name USING graft AS SELECT: OPTIONS are not supported")
      GraftCreateTableAsSelectCommand(name, loc, query, ifNotExists)
    case d @ DropTable(UnresolvedIdentifier(parts, _), ifExists, purge) =>
      val name = parts match {
        case Seq(n) => n
        case Seq(ns, n) if ns.equalsIgnoreCase("graft") => n
        case _ => return d
      }
      // only names the graft catalog actually holds — and that no real
      // catalog object shadows — are intercepted; anything else keeps
      // Spark's stock DROP TABLE behavior untouched
      if (GraftCatalog.dirOf(session, name).isEmpty) return d
      if (parts.size == 1 &&
        (session.catalog.tableExists(name) ||
          session.sessionState.catalog.isTempView(Seq(name)))) return d
      if (purge) throw new UnsupportedOperationException(
        s"DROP TABLE $name PURGE: graft registrations are external-table " +
          "semantics - DROP unregisters the name and never deletes data; " +
          "drop the directory explicitly if that is intended")
      GraftDropTableCommand(name, ifExists)
    case a @ AddColumns(t: UnresolvedTable, colsToAdd) =>
      registeredGraftName(t.multipartIdentifier) match {
        case None => a
        case Some(name) =>
          val fields = colsToAdd.map { c =>
            def decline(what: String, why: String): Nothing =
              throw new UnsupportedOperationException(
                s"ALTER TABLE $name ADD COLUMNS: $what is not supported - $why")
            if (c.path.nonEmpty)
              decline(s"nested field '${c.name.mkString(".")}'",
                "graft columns are top-level (the manifest pins a flat data schema)")
            if (c.position.nonEmpty)
              decline("FIRST/AFTER", "new columns append (the manifest pins column order)")
            if (c.`default`.nonEmpty)
              decline("DEFAULT",
                "existing files null-fill a new column; a non-null default would be " +
                  "a table rewrite, not a metadata commit")
            if (c.comment.nonEmpty)
              decline(s"COMMENT on ${c.colName}",
                "the manifest stores column names and types only")
            if (!c.nullable)
              decline(s"${c.colName} NOT NULL", "existing files null-fill it")
            StructField(c.colName, c.dataType, nullable = true)
          }
          GraftAddColumnsCommand(name, fields)
      }
    // every OTHER ALTER verb on a registered graft name would otherwise
    // fall through to a confusing TABLE_OR_VIEW_NOT_FOUND from the
    // session catalog — decline with the graft story instead
    case other: AlterTableCommand =>
      other.table match {
        case t: UnresolvedTable =>
          registeredGraftName(t.multipartIdentifier).foreach { name =>
            throw new UnsupportedOperationException(
              s"${t.commandName} on graft table $name: only ADD COLUMNS is " +
                "supported - graft schema evolution is additive (a drop/rename/" +
                "retype would rewrite data files; comments and properties are " +
                "not stored). Roll a widening back with graft_restore")
          }
          other
        case _ => other
      }
    case other => other
  }

  /** The graft registration a (possibly `graft.`-qualified) multipart
    * name resolves to — None when unregistered, or when a real catalog
    * object or temp view shadows the single-part spelling (those keep
    * Spark's stock behavior, like the DROP TABLE interception). */
  private def registeredGraftName(parts: Seq[String]): Option[String] = {
    val name = parts match {
      case Seq(n) => n
      case Seq(ns, n) if ns.equalsIgnoreCase("graft") => n
      case _ => return None
    }
    if (GraftCatalog.dirOf(session, name).isEmpty) None
    else if (parts.size == 1 &&
      (session.catalog.tableExists(name) ||
        session.sessionState.catalog.isTempView(Seq(name)))) None
    else Some(name)
  }
}

/** `CREATE TABLE <name> USING graft LOCATION '<dir>'` — registers the
  * name over an EXISTING table directory (committing its first manifest
  * when the directory is plain parquet). Persists into the warehouse
  * registry when [[GraftCatalog.RegistryConf]] is set. */
final case class GraftCreateTableCommand(name: String, location: String,
                                         ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (spark.catalog.tableExists(name))
      throw new IllegalArgumentException(
        s"CREATE TABLE $name USING graft: a catalog table or view named '$name' " +
          "already exists and would always shadow the graft registration - " +
          "drop it first or pick another name")
    if (GraftCatalog.dirOf(spark, name).isDefined) {
      if (ifNotExists) return Nil
      throw new IllegalArgumentException(
        s"CREATE TABLE $name USING graft: the name is already registered " +
          s"(-> ${GraftCatalog.dirOf(spark, name).get}); use IF NOT EXISTS " +
          "or DROP TABLE first")
    }
    if (GraftCatalog.registryPath(spark).isDefined)
      GraftCatalog.registerPersistent(spark, name, location)
    else GraftCatalog.register(spark, name, location)
    Nil
  }
}

/** `CREATE TABLE <name> USING graft LOCATION '<dir>' AS SELECT …` —
  * writes the query result to a FRESH directory, commits the first
  * manifest, registers the name. */
final case class GraftCreateTableAsSelectCommand(name: String, location: String,
    query: LogicalPlan, ifNotExists: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    if (spark.catalog.tableExists(name))
      throw new IllegalArgumentException(
        s"CREATE TABLE $name USING graft: a catalog table or view named '$name' " +
          "already exists and would always shadow the graft registration")
    if (GraftCatalog.dirOf(spark, name).isDefined) {
      if (ifNotExists) return Nil
      throw new IllegalArgumentException(
        s"CREATE TABLE $name USING graft AS SELECT: the name is already " +
          s"registered (-> ${GraftCatalog.dirOf(spark, name).get})")
    }
    val p = new org.apache.hadoop.fs.Path(location)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      throw new IllegalArgumentException(
        s"CREATE TABLE $name USING graft AS SELECT: LOCATION $location already " +
          "holds files - CTAS creates a NEW table; register the existing data " +
          "with CREATE TABLE ... LOCATION (no AS SELECT) instead")
    val df = org.apache.spark.sql.GraftBridge.ofRows(spark, query)
    df.write.mode("overwrite").parquet(location)
    Manifest.write(spark, location)
    if (GraftCatalog.registryPath(spark).isDefined)
      GraftCatalog.registerPersistent(spark, name, location)
    else GraftCatalog.register(spark, name, location)
    Nil
  }
}

/** `ALTER TABLE <name> ADD COLUMNS (…)` on a graft-registered name —
  * additive schema evolution as a pure metadata commit
  * ([[graft.sources.Layout.addColumns]]: one new manifest naming the
  * SAME file set with the fields appended; old files null-fill). */
final case class GraftAddColumnsCommand(name: String, fields: Seq[StructField])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val dir = GraftCatalog.dirOf(spark, name).getOrElse(
      throw new IllegalArgumentException(
        s"ALTER TABLE $name ADD COLUMNS: no graft registration (it may have " +
          "been dropped since the statement was parsed)"))
    graft.sources.Layout.addColumns(spark, dir, fields)
    Nil
  }
}

/** `DROP TABLE <name>` on a graft-registered name — unregisters (from
  * the warehouse registry too, when configured); the table directory is
  * untouched. */
final case class GraftDropTableCommand(name: String, ifExists: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (GraftCatalog.dirOf(spark, name).isEmpty) {
      if (ifExists) return Nil
      throw new IllegalArgumentException(
        s"DROP TABLE $name: no graft registration (it may have been dropped " +
          "since the statement was parsed); use IF EXISTS to make this a no-op")
    }
    GraftCatalog.unregisterPersistent(spark, name)
    Nil
  }
}
