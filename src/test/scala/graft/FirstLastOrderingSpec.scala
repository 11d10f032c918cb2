package graft

import org.apache.spark.sql.functions._
import graft.functions.FirstLastAgg

/** The r17 codegen'd comparator inside FirstLastFoldAgg must order exactly
  * like the interpreted ordering it replaced — EARLIEST/LATEST results are
  * oracle-pinned on the (time, tiebreak) struct ordering, nulls first. */
class FirstLastOrderingSpec extends SparkSpecBase {
  import spark.implicits._

  test("earliest/latest over struct keys with null fields match min_by/max_by") {
    // min_by/max_by use Spark's own declarative ordering — an independent
    // implementation of the same struct comparison semantics
    val df = Seq[(Integer, java.lang.Double, Long)](
      (3, 1.0, 1L), (1, 9.0, 2L), (1, 2.0, 3L), (null, 5.0, 4L),
      (2, null, 5L), (2, 0.5, 6L), (null, 1.0, 7L))
      .toDF("t", "v", "payload")
    val a = df.agg(
      FirstLastAgg.earliest(col("payload"), struct(col("t"), col("v"))).as("e"),
      FirstLastAgg.latest(col("payload"), struct(col("t"), col("v"))).as("l")).head()
    val b = df.agg(
      min_by(col("payload"), struct(col("t"), col("v"))).as("e"),
      max_by(col("payload"), struct(col("t"), col("v"))).as("l")).head()
    assert(a.getLong(0) == b.getLong(0), s"earliest: $a vs $b")
    assert(a.getLong(1) == b.getLong(1), s"latest: $a vs $b")
  }

  test("random long keys: generated comparator picks the same winners as sort") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 2000).map(i => (rnd.nextInt(50).toLong, i.toLong))
    val df = rows.toDF("k", "payload")
    val got = df.agg(
      FirstLastAgg.earliest(col("payload"), col("k")).as("e")).head().getLong(0)
    // the winner's key must be the global minimum (payloads are unique)
    val minK = rows.map(_._1).min
    assert(rows.find(_._2 == got).get._1 == minK)
  }
}
