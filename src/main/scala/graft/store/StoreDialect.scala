package graft.store

/** Mutation-SQL dialect behind [[JdbcStore]]. All inputs that are table
  * names arrive ALREADY QUOTED by the owning store (they may be stage
  * names it derived); bare column names are quoted here. The builders are
  * pure string functions so the MySQL arm — no MySQL server exists in
  * this container — is pinned at the emitted-SQL level (StoreDialectSpec)
  * while the ANSI arm runs live against embedded Derby in StoreSpec's
  * contract matrix.
  */
private[graft] sealed trait StoreDialect {
  def quote(ident: String): String

  protected def onClause(keys: Seq[String]): String =
    keys.map(k => s"t.${quote(k)} = s.${quote(k)}").mkString(" AND ")

  /** MERGE-contract upsert: update matched rows' non-key columns from the
    * stage, insert unmatched stage rows. Statements run in ONE
    * transaction ([[JdbcStore]] wraps them). */
  def upsertSql(table: String, stage: String, cols: Seq[String],
                keys: Seq[String]): Seq[String]

  /** Delete rows of `table` whose key tuple appears in `stage`. */
  def deleteWhereExistsSql(table: String, stage: String,
                           keys: Seq[String]): String

  /** Cascade arm: delete child rows whose `fk` matches a staged `key`. */
  def deleteChildSql(child: String, stage: String, key: String,
                     fk: String): String
}

private[graft] object StoreDialect {

  def forUrl(url: String): StoreDialect =
    if (url.startsWith("jdbc:mysql") || url.startsWith("jdbc:mariadb")) MySql
    else AnsiMerge

  /** ANSI arm: double-quote identifiers, one MERGE statement. Derby,
    * Postgres 15+, Oracle, SQL Server. */
  object AnsiMerge extends StoreDialect {
    override def quote(ident: String): String =
      "\"" + ident.replace("\"", "\"\"") + "\""

    override def upsertSql(table: String, stage: String, cols: Seq[String],
                           keys: Seq[String]): Seq[String] = {
      val nonKeys = cols.filterNot(keys.contains)
      val matchedArm =
        if (nonKeys.isEmpty) ""
        else "WHEN MATCHED THEN UPDATE SET " +
          nonKeys.map(c => s"${quote(c)} = s.${quote(c)}").mkString(", ") + "\n"
      Seq(
        s"MERGE INTO $table t USING $stage s ON ${onClause(keys)}\n" + matchedArm +
          s"WHEN NOT MATCHED THEN INSERT (${cols.map(quote).mkString(", ")}) " +
          s"VALUES (${cols.map(c => "s." + quote(c)).mkString(", ")})")
    }

    override def deleteWhereExistsSql(table: String, stage: String,
                                      keys: Seq[String]): String =
      s"DELETE FROM $table t WHERE EXISTS (SELECT 1 FROM $stage s WHERE ${onClause(keys)})"

    override def deleteChildSql(child: String, stage: String, key: String,
                                fk: String): String =
      s"""DELETE FROM $child c WHERE EXISTS
         |(SELECT 1 FROM $stage s WHERE s.${quote(key)} = c.${quote(fk)})""".stripMargin
  }

  /** MySQL/MariaDB arm (the reference's production DBMS — igfTables.py
    * targets InnoDB): backtick identifiers; MERGE emulated with a
    * set-based multi-table UPDATE..JOIN followed by the NOT-EXISTS
    * insert, atomically. `INSERT .. ON DUPLICATE KEY UPDATE` is NOT used:
    * it only fires on UNIQUE-index violations, so the upsert contract
    * would silently depend on an index existing over exactly `keys` —
    * the two-statement form matches MERGE on any key set. MySQL's DELETE
    * needs the `DELETE t FROM tbl t` alias form (the ANSI
    * `DELETE FROM tbl t` is a syntax error there). */
  object MySql extends StoreDialect {
    override def quote(ident: String): String =
      "`" + ident.replace("`", "``") + "`"

    override def upsertSql(table: String, stage: String, cols: Seq[String],
                           keys: Seq[String]): Seq[String] = {
      val nonKeys = cols.filterNot(keys.contains)
      val update =
        if (nonKeys.isEmpty) Nil
        else Seq(
          s"UPDATE $table t INNER JOIN $stage s ON ${onClause(keys)} SET " +
            nonKeys.map(c => s"t.${quote(c)} = s.${quote(c)}").mkString(", "))
      update :+
        (s"INSERT INTO $table (${cols.map(quote).mkString(", ")})\n" +
          s"SELECT ${cols.map(c => "s." + quote(c)).mkString(", ")} FROM $stage s\n" +
          s"WHERE NOT EXISTS (SELECT 1 FROM $table t WHERE ${onClause(keys)})")
    }

    override def deleteWhereExistsSql(table: String, stage: String,
                                      keys: Seq[String]): String =
      s"DELETE t FROM $table t WHERE EXISTS (SELECT 1 FROM $stage s WHERE ${onClause(keys)})"

    override def deleteChildSql(child: String, stage: String, key: String,
                                fk: String): String =
      s"DELETE c FROM $child c WHERE EXISTS " +
        s"(SELECT 1 FROM $stage s WHERE s.${quote(key)} = c.${quote(fk)})"
  }
}
