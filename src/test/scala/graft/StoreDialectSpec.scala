package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.store.StoreDialect
import graft.store.StoreDialect.{AnsiMerge, MySql}

/** The MySQL dialect arm pinned at the emitted-SQL level: no MySQL server
  * exists in this container, so these tests freeze the exact statements
  * the store would send (the ANSI arm additionally runs LIVE against
  * embedded Derby through the StoreContract matrix in StoreSpec — a
  * wrong statement there fails a real DBMS, not a string compare). */
class StoreDialectSpec extends AnyFunSuite {

  private val cols = Seq("run_id", "status", "lane_number")
  private val keys = Seq("run_id")

  test("dialect selection from the JDBC url") {
    assert(StoreDialect.forUrl("jdbc:derby:memory:db;create=true") eq AnsiMerge)
    assert(StoreDialect.forUrl("jdbc:postgresql://h/db") eq AnsiMerge)
    assert(StoreDialect.forUrl("jdbc:mysql://h:3306/igf") eq MySql)
    assert(StoreDialect.forUrl("jdbc:mariadb://h/igf") eq MySql)
  }

  test("quoting: ANSI doubles double-quotes, MySQL doubles backticks") {
    assert(AnsiMerge.quote("run_attribute") == "\"run_attribute\"")
    assert(AnsiMerge.quote("we\"ird") == "\"we\"\"ird\"")
    assert(MySql.quote("run_attribute") == "`run_attribute`")
    assert(MySql.quote("we`ird") == "`we``ird`")
  }

  test("ANSI upsert is one MERGE with update + insert arms") {
    val Seq(sql) = AnsiMerge.upsertSql("\"run\"", "\"run__stage\"", cols, keys)
    assert(sql.startsWith(
      "MERGE INTO \"run\" t USING \"run__stage\" s ON t.\"run_id\" = s.\"run_id\""))
    assert(sql.contains(
      "WHEN MATCHED THEN UPDATE SET \"status\" = s.\"status\", \"lane_number\" = s.\"lane_number\""))
    assert(sql.contains(
      "WHEN NOT MATCHED THEN INSERT (\"run_id\", \"status\", \"lane_number\") " +
        "VALUES (s.\"run_id\", s.\"status\", s.\"lane_number\")"))
  }

  test("MySQL upsert emulates MERGE: UPDATE..JOIN then NOT-EXISTS insert " +
       "(never ON DUPLICATE KEY, which would require a UNIQUE index on keys)") {
    val sqls = MySql.upsertSql("`run`", "`run__stage`", cols, keys)
    assert(sqls.length == 2, "update + insert, run in one transaction")
    assert(sqls(0) ==
      "UPDATE `run` t INNER JOIN `run__stage` s ON t.`run_id` = s.`run_id` " +
        "SET t.`status` = s.`status`, t.`lane_number` = s.`lane_number`")
    assert(sqls(1) ==
      "INSERT INTO `run` (`run_id`, `status`, `lane_number`)\n" +
        "SELECT s.`run_id`, s.`status`, s.`lane_number` FROM `run__stage` s\n" +
        "WHERE NOT EXISTS (SELECT 1 FROM `run` t WHERE t.`run_id` = s.`run_id`)")
    assert(!sqls.exists(_.contains("ON DUPLICATE KEY")))
  }

  test("all-key upsert (no non-key columns) degenerates to insert-if-absent " +
       "on both arms") {
    val Seq(ansi) = AnsiMerge.upsertSql("\"t\"", "\"t__stage\"", keys, keys)
    assert(!ansi.contains("WHEN MATCHED"), ansi)
    val my = MySql.upsertSql("`t`", "`t__stage`", keys, keys)
    assert(my.length == 1 && my.head.startsWith("INSERT INTO"), my)
  }

  test("multi-key ON clause joins every key with AND") {
    val ks = Seq("project_id", "sample_id")
    val Seq(sql) = AnsiMerge.upsertSql("\"t\"", "\"s\"", ks :+ "v", ks)
    assert(sql.contains(
      "ON t.\"project_id\" = s.\"project_id\" AND t.\"sample_id\" = s.\"sample_id\""))
  }

  test("MariaDB: url selects the shared arm; the full mutation surface " +
       "for a two-key table is pinned byte-exactly") {
    // No MariaDB server or client jar exists in this container (re-checked
    // this round: /opt/spark/jars has no mysql/mariadb driver, no mysqld/
    // mariadbd binary, coursier offline), so the arm is frozen at the
    // emitted-SQL level like MySQL's. MariaDB 10.x parses the identical
    // backtick / UPDATE..JOIN / DELETE-alias / NOT-EXISTS grammar, which
    // is exactly why one arm serves both — this pin makes the claim a
    // regression gate rather than a comment.
    val d = StoreDialect.forUrl("jdbc:mariadb://h:3306/igf?useSsl=false")
    assert(d eq MySql)
    val ks = Seq("project_id", "sample_id")
    val cs = ks ++ Seq("status", "md5")
    assert(d.upsertSql("`sample`", "`sample__stage`", cs, ks) == Seq(
      "UPDATE `sample` t INNER JOIN `sample__stage` s " +
        "ON t.`project_id` = s.`project_id` AND t.`sample_id` = s.`sample_id` " +
        "SET t.`status` = s.`status`, t.`md5` = s.`md5`",
      "INSERT INTO `sample` (`project_id`, `sample_id`, `status`, `md5`)\n" +
        "SELECT s.`project_id`, s.`sample_id`, s.`status`, s.`md5` " +
        "FROM `sample__stage` s\n" +
        "WHERE NOT EXISTS (SELECT 1 FROM `sample` t WHERE " +
        "t.`project_id` = s.`project_id` AND t.`sample_id` = s.`sample_id`)"))
    assert(d.deleteWhereExistsSql("`sample`", "`sample__stage`", ks) ==
      "DELETE t FROM `sample` t WHERE EXISTS (SELECT 1 FROM `sample__stage` s " +
        "WHERE t.`project_id` = s.`project_id` AND t.`sample_id` = s.`sample_id`)")
    assert(d.deleteChildSql("`sample_attribute`", "`sample__stage`",
      "sample_id", "sample_id") ==
      "DELETE c FROM `sample_attribute` c WHERE EXISTS " +
        "(SELECT 1 FROM `sample__stage` s WHERE s.`sample_id` = c.`sample_id`)")
    // weird identifiers survive quoting through the statement builders
    val Seq(ins) = d.upsertSql("`we``ird`", "`we``ird__stage`",
      Seq("k`ey"), Seq("k`ey"))
    assert(ins.contains("INSERT INTO `we``ird` (`k``ey`)"), ins)
  }

  test("MySQL delete uses the alias form its parser requires") {
    assert(MySql.deleteWhereExistsSql("`run`", "`run__stage`", keys) ==
      "DELETE t FROM `run` t WHERE EXISTS " +
        "(SELECT 1 FROM `run__stage` s WHERE t.`run_id` = s.`run_id`)")
    assert(MySql.deleteChildSql("`run_attribute`", "`run__stage`",
      "run_id", "run_id") ==
      "DELETE c FROM `run_attribute` c WHERE EXISTS " +
        "(SELECT 1 FROM `run__stage` s WHERE s.`run_id` = c.`run_id`)")
    // the ANSI form keeps the bare-alias DELETE Derby/Postgres accept
    assert(AnsiMerge.deleteWhereExistsSql("\"run\"", "\"run__stage\"", keys)
      .startsWith("DELETE FROM \"run\" t WHERE EXISTS"))
  }
}
