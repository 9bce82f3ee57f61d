package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SqlParse

/** Behavior parity with the reference parser's published test cases
  * (reference: plugins/extractors/bigquery/sqlparser/parser_test.go).
  */
class SqlParseSpec extends AnyFunSuite {

  test("simple ON join condition") {
    assert(SqlParse.parseJoinConditions(
      "select * from a.b.t1 join a.b.t2 on some_field1 = some_field2") ==
      Seq("on some_field1 = some_field2"))
  }

  test("unformatted ON join condition") {
    assert(SqlParse.parseJoinConditions(
      "select * from t1 join t2 on some_field1 =some_field2") ==
      Seq("on some_field1 =some_field2"))
  }

  test("USING with multiple columns") {
    assert(SqlParse.parseJoinConditions(
      "select * from t1 join t2 using (some_field, some_field1,somefield3)") ==
      Seq("using (some_field, some_field1,somefield3)"))
  }

  test("backtick-quoted qualified names") {
    assert(SqlParse.parseJoinConditions(
      "with d as (select * from `p.f.fly`) select * from d join `p.m.o` on d.left = `p.m.o`.right") ==
      Seq("on d.left = `p.m.o`.right"))
  }

  test("multiple joins extract all conditions") {
    val out = SqlParse.parseJoinConditions(
      "SELECT * FROM t1 JOIN t2 ON t1.a = t2.b JOIN t3 ON t1.a = t3.c")
    assert(out == Seq("ON t1.a = t2.b", "ON t1.a = t3.c"))
  }

  test("chained AND join terms stay one condition") {
    assert(SqlParse.parseJoinConditions(
      "select * from t1 join t2 on t1.a = t2.a AND t1.b = t2.b") ==
      Seq("on t1.a = t2.a AND t1.b = t2.b"))
  }

  test("comments are stripped before parsing") {
    assert(SqlParse.parseJoinConditions(
      "select * from t1 -- join commented out\njoin t2 on a = b /* on x = y */") ==
      Seq("on a = b"))
  }

  test("WHERE filter conditions incl. LIKE / BETWEEN / IN / IS") {
    // reference parity: the filter char class has no '%', so the LIKE
    // pattern is truncated at the wildcard (same output as parser.go)
    assert(SqlParse.parseFilterConditions(
      "select * from t where a = 1 AND b LIKE 'x%'") ==
      Seq("where a = 1 AND b LIKE 'x"))
    assert(SqlParse.parseFilterConditions(
      "select * from t where ts BETWEEN TIMESTAMP(2021-01-01) AND CURRENT_TIMESTAMP()").nonEmpty)
    assert(SqlParse.parseFilterConditions(
      "select * from t where x IN (1, 2, 3)") == Seq("where x IN (1, 2, 3)"))
    // reference parity: function-call LHS (parens) is outside the grammar's
    // char class, so HAVING count(1) > 2 yields no condition
    assert(SqlParse.parseFilterConditions(
      "select * from t having count(1) > 2").isEmpty)
    assert(SqlParse.parseFilterConditions(
      "select * from t having total > 2") == Seq("having total > 2"))
  }

  test("distributed column variant matches driver-side variant") {
    val spark = TestSpark.spark
    import spark.implicits._
    val sqls = Seq(
      "select * from t1 join t2 on t1.a = t2.b where x = 1",
      "select * from t1 join t2 using (k)")
    val fromCols = sqls.toDF("sql")
      .select(SqlParse.joinConditionsCol(col("sql")).as("j"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(fromCols == sqls.map(SqlParse.parseJoinConditions))
  }
}
