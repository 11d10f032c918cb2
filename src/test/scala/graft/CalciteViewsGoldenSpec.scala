package graft

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row}

/** CalciteQueryTest golden tranche: SQL views (BaseCalciteQueryTest.java
  * :1027-1070 defines aview/bview/cview/dview) and the INFORMATION_SCHEMA
  * queries over tables and views. Adaptations: the reference's `view.`
  * schema prefix is dropped (Spark temp views are schema-less), and its
  * frozen test clock (2000-01-01T00Z) replaces CURRENT_TIMESTAMP inline in
  * bview. Both engines register "tables" and views alike as session views,
  * so TABLE_TYPE parity for SQL-defined views vs datasources follows the
  * catalog's own distinction (documented per case).
  */
class CalciteViewsGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, 1.0, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 2.0, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, 3.0, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, 4.0, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, 5.0, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, 6.0, 1L)
  ).toDF("__time", "dim1", "dim2", "m1", "m2", "cnt")

  private lazy val numfoo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   Some(7L), None: Option[Long]),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], Some(325323L), Some(325323L)),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    Some(0L), Some(0L)),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   None, None),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), None, None),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], None, None)
  ).toDF("__time", "dim1", "dim2", "l1", "l2")

  private lazy val lookyloo: DataFrame = Seq(
    ("a", "xa"), ("abc", "xabc"), ("nosuchkey", "mysteryvalue"), ("6", "x6")
  ).toDF("k", "v")

  private lazy val registered: Unit = {
    graft.functions.GraftSqlFunctions.register(spark)
    foo.createOrReplaceTempView("foo")
    numfoo.createOrReplaceTempView("numfoo")
    lookyloo.createOrReplaceTempView("lookyloo")
    graft.sources.LookupRegistry.global.register("lookyloo", lookyloo)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW aview AS
        |SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo WHERE dim2 = 'a'""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW bview AS
        |SELECT COUNT(*) FROM foo
        |WHERE __time >= TIMESTAMP '2000-01-01 00:00:00' + INTERVAL '1' DAY
        |  AND __time < TIMESTAMP '2002-01-01 00:00:00'""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW cview AS
        |SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, bar.dim2 AS dim2, dnf.l2 AS l2
        |FROM (SELECT * FROM foo WHERE dim2 = 'a') bar
        |INNER JOIN numfoo dnf ON bar.dim2 = dnf.dim2""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW dview AS
        |SELECT SUBSTRING(dim1, 1, 1) AS numfoo FROM foo WHERE dim2 = 'a'""".stripMargin)
    graft.server.SystemSchema.register(spark)
  }

  private def sql(q: String): Array[Row] = { registered; spark.sql(q).collect() }
  private def single(q: String): Row = { val r = sql(q); assert(r.length == 1); r.head }

  // ---- querying views ----

  test("testCountStarOnView (CalciteQueryTest.java)") {
    assert(single("SELECT COUNT(*) FROM aview WHERE dim1_firstchar <> 'z'").getLong(0) == 2L)
  }

  test("testConfusedView — view column named after a table") {
    assert(single("SELECT COUNT(*) FROM dview AS druid WHERE druid.numfoo <> 'z'").getLong(0) == 2L)
  }

  test("testViewAndJoin — view of a join, joined again") {
    assert(single(
      """SELECT COUNT(*) FROM cview a
        |INNER JOIN foo d ON d.dim2 = a.dim2
        |WHERE a.dim1_firstchar <> 'z'""".stripMargin).getLong(0) == 8L)
  }

  test("testFilterOnCurrentTimestampOnView / LosAngelesOnView — frozen clock") {
    assert(single("SELECT * FROM bview").getLong(0) == 5L)
  }

  // ---- INFORMATION_SCHEMA over tables and views ----

  test("testInformationSchemaSchemata") {
    val names = sql("SELECT DISTINCT schema_name FROM information_schema.schemata")
      .map(_.getString(0)).toSet
    assert(names.contains("information_schema"))
    assert(names.contains("default"))
  }

  test("testInformationSchemaTables — type vocabulary and lookup joinability") {
    val rows = sql(
      """SELECT table_schema, table_name, table_type, is_joinable, is_broadcast
        |FROM information_schema.tables
        |WHERE table_type IN ('SYSTEM_TABLE', 'TABLE', 'VIEW')""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    val byName = rows.map(t => t._2 -> t).toMap
    // session-registered datasources and SQL views are all session views in
    // this catalog → TABLE (the reference distinguishes because its
    // ViewManager is a separate registry)
    assert(byName("foo") == (("druid", "foo", "TABLE", "NO", "NO")))
    assert(byName("aview")._3 == "TABLE")
    // the registered lookup is the joinable broadcast table
    assert(byName("lookyloo") == (("druid", "lookyloo", "TABLE", "YES", "YES")))
    // the metadata tables report themselves as SYSTEM_TABLE
    assert(byName("tables") == (("information_schema", "tables", "SYSTEM_TABLE", "NO", "NO")))
    assert(byName("columns")._3 == "SYSTEM_TABLE")
    assert(byName("schemata")._3 == "SYSTEM_TABLE")
  }

  test("testInformationSchemaColumnsOnTable — foo columns with Calcite type names") {
    val out = sql(
      """SELECT column_name, data_type FROM information_schema.columns
        |WHERE table_schema = 'druid' AND table_name = 'foo'
        |ORDER BY ordinal_position""".stripMargin)
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out == Seq(
      ("__time", "TIMESTAMP"), ("dim1", "VARCHAR"), ("dim2", "VARCHAR"),
      ("m1", "FLOAT"), ("m2", "DOUBLE"), ("cnt", "BIGINT")))
  }

  test("testInformationSchemaColumnsOnView / OnAnotherView") {
    val aviewCols = sql(
      """SELECT column_name, data_type, is_nullable FROM information_schema.columns
        |WHERE table_name = 'aview'""".stripMargin)
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(aviewCols == Seq(("dim1_firstchar", "VARCHAR", "YES")))
    val cviewCols = sql(
      """SELECT column_name, data_type FROM information_schema.columns
        |WHERE table_name = 'cview' ORDER BY ordinal_position""".stripMargin)
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cviewCols == Seq(
      ("dim1_firstchar", "VARCHAR"), ("dim2", "VARCHAR"), ("l2", "BIGINT")))
  }

  test("testAggregatorsOnInformationSchemaColumns — JDBC_TYPE aggregates") {
    // fixture foo here has 6 columns (the reference's 8 include dim3 and the
    // HLLC column): TIMESTAMP=93, VARCHAR=12×2, FLOAT=6, DOUBLE=8, BIGINT=-5
    val r = single(
      """SELECT COUNT(jdbc_type), SUM(jdbc_type), AVG(jdbc_type),
        |MIN(jdbc_type), MAX(jdbc_type)
        |FROM information_schema.columns
        |WHERE table_schema = 'druid' AND table_name = 'foo'""".stripMargin)
    assert((r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)) ==
      ((6L, 126L, -5L, 93L)))
    assert(math.abs(r.getDouble(2) - 21.0) < 1e-9)
  }
}
