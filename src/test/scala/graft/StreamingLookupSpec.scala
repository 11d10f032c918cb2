package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.sources.LookupRegistry
import graft.streaming.StreamingLookup

/** Kafka lookup namespace semantics (KafkaLookupExtractorFactory.java:
  * 141-230) over the MemoryStream analog of the topic: upsert per message,
  * last-write-wins by offset, resolvable through every registry consumer
  * while the stream keeps running. */
class StreamingLookupSpec extends SparkSpecBase {
  import spark.implicits._

  case class Msg(k: String, v: String, offset: Long)

  test("streaming lookup upserts per batch with last-write-wins by offset") {
    implicit val sqlCtx = spark.sqlContext
    val reg = new LookupRegistry
    val mem = MemoryStream[Msg]
    val q = StreamingLookup.start(spark, "live_dim", mem.toDF(), registry = reg)
    try {
      mem.addData(Msg("1", "one", 0L), Msg("2", "two", 1L))
      q.processAllAvailable()
      assert(reg.asMap("live_dim") == Map("1" -> "one", "2" -> "two"))

      // a later message overwrites; within one batch the higher offset wins
      mem.addData(Msg("2", "TWO", 2L), Msg("3", "three", 3L),
        Msg("3", "THREE", 4L))
      q.processAllAvailable()
      assert(reg.asMap("live_dim") ==
        Map("1" -> "one", "2" -> "TWO", "3" -> "THREE"))
    } finally q.stop()
  }

  test("a running streaming lookup serves LOOKUP()-style enrichment mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Msg]
    // global registry: the LOOKUP() SQL function resolves through it
    val q = StreamingLookup.start(spark, "live_sql_dim", mem.toDF())
    try {
      mem.addData(Msg("5", "FIVE-STAR", 0L))
      q.processAllAvailable()
      graft.functions.GraftSqlFunctions.register(spark)
      val v = spark.sql("SELECT LOOKUP('5', 'live_sql_dim')").head().getString(0)
      assert(v == "FIVE-STAR")

      mem.addData(Msg("5", "FIVE-STAR-UPDATED", 1L))
      q.processAllAvailable()
      // LOOKUP inlines the registry snapshot at plan time → a NEW query sees
      // the refreshed map (the reference's behavior: extractors read the
      // live cache; our plan-inlined analog refreshes per query)
      val v2 = spark.sql("SELECT LOOKUP('5', 'live_sql_dim')").head().getString(0)
      assert(v2 == "FIVE-STAR-UPDATED")
    } finally q.stop()
  }

  test("an oversized micro-batch fails loudly instead of silently dropping keys") {
    implicit val sqlCtx = spark.sqlContext
    val reg = new LookupRegistry
    val mem = MemoryStream[Msg]
    val q = StreamingLookup.start(spark, "tiny", mem.toDF(), registry = reg,
      maxEntries = 3)
    try {
      // 4 distinct keys in one batch against maxEntries=3 → the batch must
      // raise (fail-on-overflow contract), not truncate to an arbitrary 3
      mem.addData(Msg("a", "1", 0L), Msg("b", "2", 1L), Msg("c", "3", 2L),
        Msg("d", "4", 3L))
      val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(err.getMessage.contains("tiny") || err.getCause != null)
    } finally q.stop()
  }

  test("merging past maxEntries across batches fails before mutating state") {
    implicit val sqlCtx = spark.sqlContext
    val reg = new LookupRegistry
    val mem = MemoryStream[Msg]
    val q = StreamingLookup.start(spark, "tiny2", mem.toDF(), registry = reg,
      maxEntries = 2)
    try {
      mem.addData(Msg("a", "1", 0L), Msg("b", "2", 1L))
      q.processAllAvailable()
      assert(reg.asMap("tiny2") == Map("a" -> "1", "b" -> "2"))
      // a third distinct key would push state to 3 > maxEntries=2
      mem.addData(Msg("c", "3", 2L))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      // the failed batch did not half-merge: the snapshot still has 2 keys
      assert(reg.asMap("tiny2") == Map("a" -> "1", "b" -> "2"))
    } finally q.stop()
  }

  test("restart seeds from the registered snapshot instead of clobbering") {
    implicit val sqlCtx = spark.sqlContext
    val reg = new LookupRegistry
    reg.registerMap(spark, "seeded", Map("old" -> "kept"))
    val mem = MemoryStream[Msg]
    val q = StreamingLookup.start(spark, "seeded", mem.toDF(), registry = reg)
    try {
      mem.addData(Msg("new", "added", 0L))
      q.processAllAvailable()
      assert(reg.asMap("seeded") == Map("old" -> "kept", "new" -> "added"))
    } finally q.stop()
  }
}
