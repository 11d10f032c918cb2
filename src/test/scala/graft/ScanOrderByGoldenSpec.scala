package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{NativeQuery, ScanQuery}

/** Scan ordering parity with the reference's ScanQuerySpecTest
  * (processing/src/test/java/org/apache/druid/query/scan/ScanQuerySpecTest.java)
  * and the ScanQuery ordering reconciliation rules (ScanQuery.java:227-248,
  * 566-612). The reference suite exercises Jackson serde of the same query
  * shapes; here each shape is parsed by the JSON surface and executed, and
  * the reconciliation/validation semantics are asserted directly.
  */
class ScanOrderByGoldenSpec extends SparkSpecBase {
  import spark.implicits._

  private def resolver: NativeQuery.Resolver =
    name => spark.read.parquet(s"${sf()}/$name.parquet")

  private def run(json: String): DataFrame = NativeQuery.run(spark, json, resolver)

  // testSerialization (ScanQuerySpecTest.java:41-84): legacy form — bare
  // field set, object-form LegacySegmentSpec intervals, columns + limit.
  test("legacy-form scan: object-form intervals, columns, limit (ScanQuerySpecTest.java:41)") {
    val df = run(
      """{
        "queryType": "scan",
        "dataSource": {"type": "table", "name": "orders"},
        "timeColumn": "o_orderdate",
        "intervals": {"type": "LegacySegmentSpec",
                      "intervals": ["1996-01-01T00:00:00.000Z/1996-04-01T00:00:00.000Z"]},
        "filter": null,
        "columns": ["o_orderkey", "o_orderstatus", "o_totalprice"],
        "limit": 3,
        "context": null
      }""")
    val rows = df.collect()
    assert(rows.length == 3)
    assert(df.columns.toSeq == Seq("o_orderkey", "o_orderstatus", "o_totalprice"))
  }

  // testSerializationWithTimeOrder (ScanQuerySpecTest.java:87-127):
  // "order": "ascending" == orderBy [(__time, ASC)]; getTimeOrder ASCENDING.
  test("time order via 'order' field; timeOrder reconciliation (ScanQuerySpecTest.java:87)") {
    val df = run(
      """{
        "queryType": "scan",
        "dataSource": "orders",
        "timeColumn": "o_orderdate",
        "intervals": ["1996-01-01T00:00:00.000Z/1996-02-01T00:00:00.000Z"],
        "resultFormat": "list",
        "limit": 5,
        "order": "ascending",
        "columns": ["o_orderkey", "o_totalprice", "o_orderdate"]
      }""")
    val got = df.collect().map(_.getAs[java.time.LocalDateTime]("o_orderdate"))
    assert(got.length == 5)
    assert(got.sliding(2).forall { case Array(a, b) => !a.isAfter(b); case _ => true })
    // reconciliation: a lone orderBy on the time column IS the time order
    val q = ScanQuery(columns = Seq("o_orderdate"), timeColumn = "o_orderdate",
      orderBy = Seq("o_orderdate" -> true))
    assert(q.timeOrder.contains(true))
  }

  // testSerializationWithOrderBy (ScanQuerySpecTest.java:130-170): orderBy a
  // non-time column; getTimeOrder must be NONE; rows sort by that column.
  test("generalized orderBy on a non-time column (ScanQuerySpecTest.java:130)") {
    val df = run(
      """{
        "queryType": "scan",
        "dataSource": "orders",
        "timeColumn": "o_orderdate",
        "intervals": ["1996-01-01T00:00:00.000Z/1996-02-01T00:00:00.000Z"],
        "limit": 8,
        "orderBy": [{"columnName": "o_totalprice", "order": "descending"}],
        "columns": ["o_orderkey", "o_totalprice", "o_orderdate"]
      }""")
    val got = df.collect().map(_.getAs[Double]("o_totalprice"))
    assert(got.length == 8)
    assert(got.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    val q = ScanQuery(columns = Seq("o_orderkey", "o_totalprice"),
      orderBy = Seq("o_totalprice" -> false))
    assert(q.timeOrder.isEmpty)
  }

  test("multi-column orderBy executes in key order") {
    val df = run(
      """{
        "queryType": "scan",
        "dataSource": "orders",
        "timeColumn": "o_orderdate",
        "limit": 20,
        "orderBy": [{"columnName": "o_orderpriority", "order": "ascending"},
                    {"columnName": "o_totalprice", "order": "descending"}],
        "columns": ["o_orderpriority", "o_totalprice"]
      }""")
    val got = df.as[(String, Double)].collect()
    assert(got.length == 20)
    assert(got.sliding(2).forall {
      case Array((p1, t1), (p2, t2)) => p1 < p2 || (p1 == p2 && t1 >= t2)
      case _ => true
    })
  }

  // ScanQuery.java:238 — orderBy columns must be selected.
  test("orderBy column absent from 'columns' is rejected (ScanQuery.java:238)") {
    val e = intercept[IllegalArgumentException] {
      ScanQuery(columns = Seq("o_orderkey"), orderBy = Seq("o_totalprice" -> true))
        .run(spark.read.parquet(s"${sf()}/orders.parquet"))
    }
    assert(e.getMessage == "Column [o_totalprice] from 'orderBy' must also appear in 'columns'.")
  }

  // ScanQuery.java:240 — the time column must be selected when time-ordered.
  test("time-ordered scan without the time column is rejected (ScanQuery.java:240)") {
    val e = intercept[IllegalArgumentException] {
      ScanQuery(columns = Seq("o_orderkey"), timeColumn = "o_orderdate", order = Some(true))
        .run(spark.read.parquet(s"${sf()}/orders.parquet"))
    }
    assert(e.getMessage == "The __time column must be selected if the results are time-ordered.")
  }

  // ScanQuery.java:586-589 — 'order' incompatible with 'orderBy' → IAE.
  test("incompatible 'order' + 'orderBy' is rejected (ScanQuery.java:588)") {
    val e = intercept[IllegalArgumentException] {
      ScanQuery(columns = Seq("o_orderdate", "o_totalprice"), timeColumn = "o_orderdate",
        order = Some(true), orderBy = Seq("o_totalprice" -> true))
        .run(spark.read.parquet(s"${sf()}/orders.parquet"))
    }
    assert(e.getMessage == "Cannot provide 'order' incompatible with 'orderBy'")
    // compatible spelling of the same ordering is accepted
    val ok = ScanQuery(columns = Seq("o_orderdate"), timeColumn = "o_orderdate",
      order = Some(true), orderBy = Seq("o_orderdate" -> true), limit = Some(1))
      .run(spark.read.parquet(s"${sf()}/orders.parquet"))
    assert(ok.count() == 1)
  }
}
