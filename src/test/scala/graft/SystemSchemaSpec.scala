package graft

import graft.server.SystemSchema
import graft.sources.Sources

/** INFORMATION_SCHEMA + sys.segments parity (CalciteQueryTest.java:183-396
  * queries INFORMATION_SCHEMA.SCHEMATA/TABLES/COLUMNS; SystemSchema.java:115
  * defines sys.segments). */
class SystemSchemaSpec extends SparkSpecBase {

  test("INFORMATION_SCHEMA.TABLES and COLUMNS list registered datasources (:199, :273)") {
    Sources.table(spark, sf(), "nation").createOrReplaceTempView("nation_sys_test")
    SystemSchema.register(spark)

    val tables = spark.sql(
      """SELECT table_name, table_type FROM information_schema.tables
        |WHERE table_name = 'nation_sys_test'""".stripMargin).collect()
    assert(tables.length == 1)

    // the reference returns (column_name, data_type, ordinal) per column;
    // testInformationSchemaColumnsOnTable asserts the dimension columns
    val cols = spark.sql(
      """SELECT column_name, ordinal_position, data_type, is_nullable
        |FROM information_schema.columns
        |WHERE table_name = 'nation_sys_test' ORDER BY ordinal_position""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1).toInt))
    val expected = spark.table("nation_sys_test").schema.fieldNames.toSeq
    assert(cols.map(_._1).toSeq == expected)
    // 0-based, matching InformationSchema.java:430 field.getIndex()
    assert(cols.map(_._2).toSeq == expected.indices)
  }

  test("aggregations run over INFORMATION_SCHEMA.COLUMNS (:376)") {
    Sources.table(spark, sf(), "region").createOrReplaceTempView("region_sys_test")
    SystemSchema.register(spark)
    val n = spark.sql(
      """SELECT COUNT(*) FROM information_schema.columns
        |WHERE table_name = 'region_sys_test'""".stripMargin).head().getLong(0)
    assert(n == spark.table("region_sys_test").schema.size.toLong)
  }

  test("sys.segments serves the segment inventory (SystemSchema.java:115)") {
    val out = java.nio.file.Files.createTempDirectory("syssegments").toString
    Sources.table(spark, sf(), "orders").write.mode("overwrite").parquet(out)
    SystemSchema.registerSegments(spark, "orders_ds", out, "o_orderdate")
    val rows = spark.sql(
      "SELECT datasource, num_rows, size FROM sys.segments").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getString(0) == "orders_ds"))
    assert(rows.map(_.getLong(1)).sum == Sources.table(spark, sf(), "orders").count())
    assert(rows.forall(_.getLong(2) > 0))
  }
}
