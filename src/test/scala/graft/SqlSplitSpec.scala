package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `sql` CLI's quote-aware statement splitter: ';' inside quoted
  * regions must stay put (the old blind split broke `LIKE '%;%'` into
  * invalid fragments), while multi-statement scripts still split. */
class SqlSplitSpec extends AnyFunSuite {

  test("plain multi-statement split, trimming and dropping empties") {
    assert(Main.splitSqlStatements("SELECT 1; SELECT 2 ;; SELECT 3") ==
      Seq("SELECT 1", "SELECT 2", "SELECT 3"))
    assert(Main.splitSqlStatements("  SELECT 1  ") == Seq("SELECT 1"))
    assert(Main.splitSqlStatements(";;;") == Seq.empty)
  }

  test("';' inside single-quoted literals and double-quoted identifiers stays put") {
    assert(Main.splitSqlStatements("SELECT * FROM t WHERE c LIKE '%;%'") ==
      Seq("SELECT * FROM t WHERE c LIKE '%;%'"))
    assert(Main.splitSqlStatements("INSERT INTO t VALUES ('a;b'); SELECT 1") ==
      Seq("INSERT INTO t VALUES ('a;b')", "SELECT 1"))
    assert(Main.splitSqlStatements("SELECT \"odd;name\" FROM t; SELECT 2") ==
      Seq("SELECT \"odd;name\" FROM t", "SELECT 2"))
  }

  test("the '' escape keeps the literal open across a doubled quote") {
    assert(Main.splitSqlStatements("SELECT 'it''s; fine'; SELECT 1") ==
      Seq("SELECT 'it''s; fine'", "SELECT 1"))
    // unterminated quote: conservative — never splits inside it
    assert(Main.splitSqlStatements("SELECT 'open; SELECT 2") ==
      Seq("SELECT 'open; SELECT 2"))
  }
}
