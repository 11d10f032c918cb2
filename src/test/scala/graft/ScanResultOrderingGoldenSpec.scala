package graft

import graft.operators.NativeQuery

/** ScanQueryResultOrderingTest.java goldens (processing/.../query/scan):
  * run-to-run stability of scan result order — the property offset-based
  * pagination depends on. Time-ordered scans break timestamp ties in
  * per-segment row order ascending and REVERSED row order descending (the
  * reference's cursor order); this engine's distributed analog is the
  * materialized monotonic row id, deterministic for a given input order.
  * The fixture is the reference's three segments' rows concatenated in
  * segment order; the expected id sequences are the reference's own.
  * The reference's parameterization over batchSize /
  * maxRowsQueuedForOrdering / segment-to-server maps exercises its
  * n-way-merge internals — result order must be (and is asserted) identical
  * at every knob setting, so the single distributed plan here is the same
  * adjudication. The limit axis is ported (expected truncates per limit).
  */
class ScanResultOrderingGoldenSpec extends SparkSpecBase {

  // SEGMENTS rows in order: segment 1 (day 1, partition 0), segment 2
  // (day 1, partition 1), segment 3 (day 2)
  private val ds = """{"type": "inline",
    "columnNames": ["__time", "id"],
    "columnTypes": ["STRING", "LONG"],
    "rows": [
      ["2000-01-01T01:00:00", 101],
      ["2000-01-01T01:00:00", 80],
      ["2000-01-01T01:00:00", 232],
      ["2000-01-01T01:00:00", 12],
      ["2000-01-01T02:00:00", 808],
      ["2000-01-01T02:00:00", 411],
      ["2000-01-01T02:00:00", 383],
      ["2000-01-01T05:00:00", 22],
      ["2000-01-01T01:00:00", 333],
      ["2000-01-01T01:00:00", 222],
      ["2000-01-01T01:00:00", 444],
      ["2000-01-01T01:00:00", 111],
      ["2000-01-01T03:00:00", 555],
      ["2000-01-01T03:00:00", 999],
      ["2000-01-01T03:00:00", 888],
      ["2000-01-01T05:00:00", 777],
      ["2000-01-02T00:00:00", 7],
      ["2000-01-02T02:00:00", 9],
      ["2000-01-02T03:00:00", 8]]}"""

  private def run(order: String, limit: Int): Seq[Long] = {
    val lim = if (limit > 0) s""", "limit": $limit""" else ""
    NativeQuery.run(spark, s"""{
        "queryType": "scan",
        "dataSource": $ds,
        "columns": ["__time", "id"],
        "order": "$order"$lim
      }""", _ => spark.emptyDataFrame)
      .collect().map(_.getAs[Long]("id")).toSeq
  }

  private val ascending = Seq[Long](
    101, 80, 232, 12, 333, 222, 444, 111, 808, 411, 383,
    555, 999, 888, 22, 777, 7, 9, 8)
  private val descending = Seq[Long](
    8, 9, 7, 777, 22, 888, 999, 555, 383, 411, 808,
    111, 444, 222, 333, 12, 232, 80, 101)

  test("testOrderNone (:205): an unordered scan returns segment iteration " +
      "order — the input row order, run-to-run stable") {
    assert(run("none", 0) == Seq[Long](
      101, 80, 232, 12, 808, 411, 383, 22, 333, 222, 444, 111,
      555, 999, 888, 777, 7, 9, 8))
  }

  test("testOrderTimeAscending (:239): time ascending, ties in per-segment " +
      "row order — at every limit") {
    for (limit <- Seq(0, 3, 7, 10, 19, 21))
      assert(run("ascending", limit) ==
        (if (limit > 0) ascending.take(limit) else ascending), s"limit=$limit")
  }

  test("testOrderTimeDescending (:273): time descending, ties in REVERSED " +
      "row order — at every limit") {
    for (limit <- Seq(0, 3, 7, 10, 19, 21))
      assert(run("descending", limit) ==
        (if (limit > 0) descending.take(limit) else descending), s"limit=$limit")
  }
}
