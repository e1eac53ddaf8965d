package graft.store

import java.sql.Connection
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JDBC-backed [[Store]] — the engine's counterpart of the reference's live
  * MySQL deployment (dbconnect.py:8-165; baseadaptor.py:331-345 read_sql →
  * `spark.read.jdbc`, SURVEY §2.1's "spark.read.jdbc or Parquet" mapping).
  *
  * Execution shape, designed for a real DBMS behind a 1000-executor cluster:
  *   - READS go through `spark.read.jdbc`; [[readPartitioned]] splits the
  *     scan into `numPartitions` range predicates so a fact-sized table
  *     streams through many executors instead of one connection.
  *   - WRITES append partition-parallel via `df.write.jdbc` (one INSERT
  *     batch per partition).
  *   - MUTATIONS (insert-if-absent / upsert / delete) stage the incoming
  *     frame into a side table partition-parallel, then run ONE set-based
  *     SQL statement (INSERT..WHERE NOT EXISTS / MERGE / DELETE..EXISTS)
  *     inside the DBMS — the N+1 per-row probe loops of the reference
  *     (collect_seqrun_fastq_to_db.py:515-757) become a single join the
  *     database executes with its own planner. No per-row driver round trip
  *     anywhere.
  *
  * Tables are created with quoted, case-preserved identifiers and strings
  * as VARCHAR(`varcharLen`) — NOT the dialect default CLOB, which most
  * engines (Derby included) refuse to compare in MERGE/join predicates.
  *
  * Differences from the parquet [[MetadataStore]], inherent to a live DBMS:
  * no snapshot versioning/time travel, and `upsert` requires the incoming
  * frame to be unique on `keys` (SQL MERGE raises on cardinality violations
  * where the snapshot path would keep both rows).
  *
  * Tested against embedded Derby (the in-JVM DBMS on the Spark classpath).
  * Mutation SQL is emitted per [[StoreDialect]]: the ANSI arm (MERGE +
  * double-quote identifiers) covers Derby, Postgres 15+, Oracle, SQL
  * Server; the MySQL arm (the reference's production DBMS — igfTables.py
  * targets InnoDB) uses backtick quoting and emulates the MERGE contract
  * with a set-based UPDATE..JOIN + NOT-EXISTS INSERT in one transaction
  * (ON DUPLICATE KEY would silently require a UNIQUE index on `keys`).
  * The dialect is picked from the URL; no MySQL server exists in this
  * container, so the MySQL arm is pinned by StoreDialectSpec at the
  * emitted-SQL level while Derby exercises the full contract live.
  */
final class JdbcStore(spark: SparkSession, url: String,
                      props: Properties = new Properties,
                      varcharLen: Int = 1024) extends Store {
  JdbcStore.quietDerby()

  private val dialect: StoreDialect = StoreDialect.forUrl(url)
  private def q(ident: String): String = dialect.quote(ident)

  private def withConn[A](f: Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def exec(sql: String): Int = withConn { c =>
    val st = c.createStatement(); try st.executeUpdate(sql) finally st.close()
  }

  /** Run several statements atomically (the MySQL upsert emulation needs
    * UPDATE + INSERT to land together); returns the summed update count. */
  private def execAll(sqls: Seq[String]): Int = withConn { c =>
    c.setAutoCommit(false)
    try {
      val st = c.createStatement()
      val n = try sqls.map(st.executeUpdate).sum finally st.close()
      c.commit(); n
    } catch { case e: Throwable => c.rollback(); throw e }
  }

  override def exists(name: String): Boolean = withConn { c =>
    // getTables takes a LIKE pattern: '_'/'%' are wildcards, and nearly
    // every store table name contains underscores (run_attribute, every
    // __stage table) — escape them or `run_attribute` matches `runXattribute`
    val md = c.getMetaData
    val esc = md.getSearchStringEscape
    val pattern = name.replace(esc, esc + esc)
      .replace("_", esc + "_").replace("%", esc + "%")
    val rs = md.getTables(null, null, pattern, null)
    try rs.next() finally rs.close()
  }

  override def read(name: String): DataFrame = {
    require(exists(name), s"table $name does not exist at $url")
    spark.read.jdbc(url, q(name), props)
  }

  /** Range-partitioned parallel read — one connection per partition, each
    * fetching `partitionCol` within its stride (the Spark-side answer to a
    * fact-sized DB table). */
  def readPartitioned(name: String, partitionCol: String,
                      lower: Long, upper: Long, numPartitions: Int): DataFrame =
    spark.read.jdbc(url, q(name), q(partitionCol), lower, upper, numPartitions, props)

  /** [[readPartitioned]] with bounds probed from the table itself (one
    * tiny MIN/MAX aggregate the DBMS answers from the key's index) — what
    * a deployment actually calls, since hard-coded bounds rot as the table
    * grows. Empty tables fall back to a plain single-partition read. */
  def readPartitionedAuto(name: String, partitionCol: String,
                          numPartitions: Int): DataFrame = {
    val bounds = withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT MIN(${q(partitionCol)}), MAX(${q(partitionCol)}) FROM ${q(name)}")
        try {
          rs.next()
          val lo = rs.getLong(1); val loNull = rs.wasNull()
          val hi = rs.getLong(2); val hiNull = rs.wasNull()
          if (loNull || hiNull) None else Some((lo, hi))
        } finally rs.close()
      } finally st.close()
    }
    bounds match {
      case Some((lo, hi)) if hi > lo =>
        readPartitioned(name, partitionCol, lo, hi, numPartitions)
      case _ => read(name)
    }
  }

  private def ddlType(dt: DataType): String = dt match {
    case StringType         => s"VARCHAR($varcharLen)"
    case LongType           => "BIGINT"
    case IntegerType        => "INTEGER"
    case ShortType          => "SMALLINT"
    case ByteType           => "SMALLINT"
    case DoubleType         => "DOUBLE"
    case FloatType          => "REAL"
    case BooleanType        => "BOOLEAN"
    case DateType           => "DATE"
    case TimestampType      => "TIMESTAMP"
    case BinaryType         => "BLOB"
    case d: DecimalType     => s"DECIMAL(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"JdbcStore has no DDL mapping for $other")
  }

  private def createEmpty(name: String, schema: StructType): Unit = {
    val cols = schema.fields
      .map(f => s"${q(f.name)} ${ddlType(f.dataType)}").mkString(", ")
    exec(s"CREATE TABLE ${q(name)} ($cols)")
  }

  private def dropIfExists(name: String): Unit =
    if (exists(name)) { exec(s"DROP TABLE ${q(name)}"); () }

  private def appendRows(name: String, df: DataFrame): Unit =
    df.write.mode("append").jdbc(url, q(name), props)

  override def create(name: String, df: DataFrame): Unit = {
    val fresh = Store.normalize(df)
    dropIfExists(name)
    createEmpty(name, fresh.schema)
    appendRows(name, fresh)
  }

  override def append(name: String, df: DataFrame): Unit = {
    val fresh = Store.normalize(df)
    if (!exists(name)) createEmpty(name, fresh.schema)
    appendRows(name, fresh)
  }

  /** Stage `df` into `<name>__stage` (partition-parallel), run `sql` against
    * it as one statement, drop the stage. Returns the statement's row count. */
  private def viaStage(name: String, df: DataFrame)(sql: String => String): Int =
    viaStageAll(name, df)(stage => Seq(sql(stage)))

  private def viaStageAll(name: String, df: DataFrame)
                         (sqls: String => Seq[String]): Int = {
    val stage = name + "__stage"
    dropIfExists(stage)
    createEmpty(stage, df.schema)
    appendRows(stage, df)
    try execAll(sqls(q(stage))) finally dropIfExists(stage)
  }

  override def insertIfAbsent(name: String, df: DataFrame, keys: Seq[String]): Long = {
    val fresh = Store.normalize(df)
    if (!exists(name)) { createEmpty(name, fresh.schema); appendRows(name, fresh); fresh.count() }
    else {
      val cols = fresh.schema.fieldNames
      val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
      viaStage(name, fresh) { stage =>
        s"""INSERT INTO ${q(name)} (${cols.map(q).mkString(", ")})
           |SELECT ${cols.map(c => "s." + q(c)).mkString(", ")} FROM $stage s
           |WHERE NOT EXISTS (SELECT 1 FROM ${q(name)} t WHERE $on)""".stripMargin
      }.toLong
    }
  }

  override def upsert(name: String, df: DataFrame, keys: Seq[String]): Unit = {
    val fresh = Store.normalize(df)
    if (!exists(name)) { createEmpty(name, fresh.schema); appendRows(name, fresh) }
    else {
      val cols = fresh.schema.fieldNames.toSeq
      viaStageAll(name, fresh) { stage =>
        dialect.upsertSql(q(name), stage, cols, keys)
      }
      ()
    }
  }

  override def delete(name: String, keysDf: DataFrame, keys: Seq[String]): Unit = {
    val keyFrame = keysDf.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct()
    viaStage(name, keyFrame) { stage =>
      dialect.deleteWhereExistsSql(q(name), stage, keys)
    }
    ()
  }

  /** Cascade scoped to the PASSED keys: children are deleted by membership
    * in the staged key set, not by a global orphan sweep — pre-existing
    * orphans a caller didn't ask about are left alone (they're a data-quality
    * signal, not this call's business). One staged table serves the parent
    * delete and every child delete. */
  override def deleteCascade(parent: String, keysDf: DataFrame, keys: Seq[String],
                             children: Seq[(String, String)]): Unit = {
    val keyFrame = keysDf.select(keys.map(org.apache.spark.sql.functions.col): _*).distinct()
    val stage = parent + "__stage"
    dropIfExists(stage)
    createEmpty(stage, keyFrame.schema)
    appendRows(stage, keyFrame)
    try {
      exec(dialect.deleteWhereExistsSql(q(parent), q(stage), keys))
      children.foreach { case (child, fk) =>
        exec(dialect.deleteChildSql(q(child), q(stage), keys.head, fk))
      }
    } finally dropIfExists(stage)
  }
}

object JdbcStore {
  import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}

  /** Spark's built-in Derby dialect maps StringType → CLOB, which Derby
    * refuses to compare in predicates AND binds nulls as setNull(CLOB) —
    * failing against the VARCHAR columns this store creates. Shadow it for
    * derby: URLs with a VARCHAR mapping; reads fall through to Spark's
    * default JDBC→Catalyst mapping. */
  private object DerbyVarcharDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def quoteIdentifier(colName: String): String =
      "\"" + colName.replace("\"", "\"\"") + "\""
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType  => Some(JdbcType("VARCHAR(32672)", java.sql.Types.VARCHAR))
      case BooleanType => Some(JdbcType("BOOLEAN", java.sql.Types.BOOLEAN))
      case ShortType | ByteType => Some(JdbcType("SMALLINT", java.sql.Types.SMALLINT))
      case _ => None
    }
  }

  private lazy val quiet: Unit = {
    // embedded Derby writes derby.log into the CWD unless told otherwise
    if (System.getProperty("derby.stream.error.file") == null)
      System.setProperty("derby.stream.error.file",
        System.getProperty("java.io.tmpdir") + "/derby.log")
    JdbcDialects.registerDialect(DerbyVarcharDialect)
  }
  private def quietDerby(): Unit = quiet
}
