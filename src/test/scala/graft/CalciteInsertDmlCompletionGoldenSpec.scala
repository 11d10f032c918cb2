package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.server.PlannerResources
import graft.sources.SqlInsertDml

/** Completion tranche for CalciteInsertDmlTest.java — the remaining
  * non-auth cases (views, self-insert, invalid names, PARTITIONED BY +
  * CLUSTERED BY together, grammar supersets). With this file every
  * CalciteInsertDmlTest case is either ported or an explicit non-goal:
  * testInsertFromUnauthorizedDataSource / testInsertIntoUnauthorizedDataSource
  * / testInsertFromExternalUnauthorized / testExplainInsertFromExternalUnauthorized
  * exercise the reference's authorizer (ForbiddenException), and this
  * engine has no auth layer — the resource sets those cases authorize are
  * covered by PlannerResourceAnalyzeGoldenSpec instead. */
class CalciteInsertDmlCompletionGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_dml_spec2").toString

  /** CalciteTests.RAW_ROWS1 shape: the six foo rows with dim2 + float m1. */
  private lazy val foo: DataFrame = Seq(
    (ts("2000-01-01 00:00:00"), "",     Option("a"),   1.0f, 1L),
    (ts("2000-01-02 00:00:00"), "10.1", None: Option[String], 2.0f, 1L),
    (ts("2000-01-03 00:00:00"), "2",    Option(""),    3.0f, 1L),
    (ts("2001-01-01 00:00:00"), "1",    Option("a"),   4.0f, 1L),
    (ts("2001-01-02 00:00:00"), "def",  Option("abc"), 5.0f, 1L),
    (ts("2001-01-03 00:00:00"), "abc",  None: Option[String], 6.0f, 1L))
    .toDF("__time", "dim1", "dim2", "m1", "cnt")

  private lazy val registered: Unit = {
    foo.createOrReplaceTempView("foo")
    PlannerResources.createView(spark, "aview",
      "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo WHERE dim2 = 'a'")
  }

  test("testInsertFromView (CalciteInsertDmlTest.java:142) — a view is a legal source") {
    registered
    // the reference spells the source `view.aview`; views register
    // unprefixed here (the port's view naming convention)
    val out = SqlInsertDml.run(spark,
      "INSERT INTO dst_fromview SELECT * FROM aview PARTITIONED BY ALL TIME", freshBase())
    assert(out.columns.toSeq == Seq("dim1_firstchar"))
    assert(out.orderBy("dim1_firstchar").collect().map(_.getString(0)).toSeq == Seq("", "1"))
  }

  test("testInsertIntoExistingTable (:162) — self-insert reads before it appends") {
    registered
    val base = freshBase()
    SqlInsertDml.run(spark,
      "INSERT INTO dst_self SELECT * FROM foo PARTITIONED BY ALL TIME", base)
    // INSERT INTO t SELECT * FROM t: the read must materialize before the
    // append scans the same segment directory
    val out = SqlInsertDml.run(spark,
      "INSERT INTO dst_self SELECT * FROM dst_self PARTITIONED BY ALL TIME", base)
    assert(out.count() == 12)
  }

  test("testInsertIntoInvalidDataSourceName (:198) — '/' in a quoted target") {
    registered
    val e = intercept[IllegalArgumentException] {
      SqlInsertDml.parse("INSERT INTO \"in/valid\" SELECT dim1, dim2 FROM foo PARTITIONED BY ALL TIME")
    }
    assert(e.getMessage == "INSERT dataSource cannot contain the '/' character.")
  }

  test("testInsertIntoSystemTable (:225) — exact reference message") {
    registered
    val e = intercept[IllegalArgumentException] {
      SqlInsertDml.parse(
        "INSERT INTO INFORMATION_SCHEMA.COLUMNS SELECT * FROM foo PARTITIONED BY ALL TIME")
    }
    assert(e.getMessage ==
      "Cannot INSERT into [INFORMATION_SCHEMA.COLUMNS] because it is not a Druid datasource.")
  }

  test("testInsertIntoView (:237) — views reject as targets, qualified or not") {
    registered
    val qualified = intercept[IllegalArgumentException] {
      SqlInsertDml.parse("INSERT INTO view.aview SELECT * FROM foo PARTITIONED BY ALL TIME")
    }
    assert(qualified.getMessage ==
      "Cannot INSERT into [view.aview] because it is not a Druid datasource.")
    // the unprefixed registered view rejects at run (the registry knows it)
    val unprefixed = intercept[IllegalArgumentException] {
      SqlInsertDml.run(spark,
        "INSERT INTO aview SELECT * FROM foo PARTITIONED BY ALL TIME", freshBase())
    }
    assert(unprefixed.getMessage ==
      "Cannot INSERT into [view.aview] because it is not a Druid datasource.")
  }

  test("testInsertWithPartitionedByAndClusteredBy (:418) — day chunks + cluster layout") {
    registered
    val base = freshBase()
    val out = SqlInsertDml.run(spark,
      """INSERT INTO druid.dst_pbcb SELECT __time, FLOOR(m1) as floor_m1, dim1 FROM foo
        |PARTITIONED BY DAY CLUSTERED BY 2, dim1""".stripMargin, base)
    assert(out.count() == 6)
    assert(out.columns.toSeq == Seq("__time", "floor_m1", "dim1"))
    // six rows on six distinct days → six day chunks
    val chunks = new java.io.File(s"$base/dst_pbcb").listFiles()
      .filter(_.getName.startsWith("__chunk=")).map(_.getName).sorted
    assert(chunks.length == 6 && chunks.head == "__chunk=2000-01-01T00")
  }

  test("testInsertWithInvalidSelectStatement (:735) — SUPERSET: `as count` parses here") {
    registered
    // the reference's Calcite grammar reserves `count` and fails the parse;
    // Spark's parser accepts it as an alias — a strict grammar superset
    val out = SqlInsertDml.run(spark,
      "INSERT INTO dst_count_alias SELECT dim1, m1 as count FROM foo PARTITIONED BY ALL",
      freshBase())
    assert(out.columns.toSeq == Seq("dim1", "count") && out.count() == 6)
  }

  test("testSurfaceErrorsWhenInsertingThroughIncorrectSelectStatment (CalciteQueryTest.java:13926) — SUPERSET: UNION dedupes") {
    registered
    // the reference is unplannable ("SQL requires 'UNION' but only 'UNION
    // ALL' is supported."); Spark plans bare UNION as union-distinct
    val out = SqlInsertDml.run(spark,
      """INSERT INTO druid.dst_union SELECT dim2, dim1, m1 FROM foo
        |UNION SELECT dim1, dim2, m1 FROM foo PARTITIONED BY ALL TIME""".stripMargin,
      freshBase())
    // 6 + 6 rows, minus exact duplicates across the two branches
    assert(out.count() == spark.sql(
      """SELECT dim2, dim1, m1 FROM foo UNION SELECT dim1, dim2, m1 FROM foo""").count())
  }
}
