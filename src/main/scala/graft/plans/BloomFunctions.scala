package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.LongType

/** Bloom filter surface (SURVEY §2.4 `bloom` DimFilter + §2.6 bloom
  * aggregator — extensions-core/druid-bloom-filter).
  *
  * Wraps Spark's internal BloomFilterAggregate / BloomFilterMightContain
  * (the machinery behind runtime row-level filtering) as user-facing
  * functions: build a serialized bloom filter over a key column, then test
  * membership — including against filters built in a previous job, which is
  * the reference's use case (POST a serialized filter with the query).
  * Classic 100 TB pattern: build on the small side, semi-join the fact scan
  * with might_contain before the real join.
  */
object BloomFunctions {
  private def c(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    CatalystBridge.column(e)
  private def e(col: Column) = CatalystBridge.expression(col)

  /** Aggregate a LONG key column into a serialized bloom filter (binary). */
  def bloomFilterAgg(col: Column, expectedItems: Long = 100000L, numBits: Long = 1L << 22): Column =
    c(BloomFilterAggregate(e(col.cast("long")),
      Literal(expectedItems, LongType), Literal(numBits, LongType), 0, 0)
      .toAggregateExpression())

  /** Test membership of a LONG key against a serialized bloom filter. */
  def mightContain(bloom: Column, key: Column): Column =
    c(BloomFilterMightContain(e(bloom), e(key.cast("long"))))
}
