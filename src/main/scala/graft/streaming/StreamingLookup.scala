package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.sources.LookupRegistry

/** Streaming lookup namespace (reference: extensions-core/
  * kafka-extraction-namespace/.../KafkaLookupExtractorFactory.java:141-230
  * and KafkaExtractionNamespaceModule.java): a lookup map continuously
  * updated from a (key, value) topic — every consumed message upserts its
  * key, last write wins — while queries keep resolving against the freshest
  * on-heap snapshot.
  *
  * Spark mapping: the consumer loop is ONE Structured Streaming query; each
  * micro-batch reduces to latest-value-per-key (max_by on the stream's
  * offset order, the micro-batch analog of "later message overwrites") and
  * folds into the registered lookup. The map stays on-heap exactly like the
  * reference's NamespaceExtractionCacheManager cache, and every consumer of
  * the registry — LOOKUP() SQL, the `lookup` JSON datasource,
  * lookup/registeredLookup extraction fns — sees each batch's merge as soon
  * as it commits. Offset tracking + restart recovery ride the streaming
  * checkpoint, which the reference implements by hand with
  * consumer.position() bookkeeping.
  */
object StreamingLookup {

  /** Start maintaining lookup `name` from a streaming (key, value[, offset])
    * frame. `offsetCol` orders writes within a micro-batch (Kafka's `offset`
    * column; any monotonically increasing sequence works) — without it the
    * batch's per-key winner is arbitrary, matching the reference's behavior
    * for keyless ordering only when the topic is single-partition.
    *
    * `maxEntries` guards the on-heap map the same way the registry's scalar
    * path does: a lookup is by-contract small (the reference holds it in a
    * process-wide ConcurrentMap too); bigger reference data belongs in the
    * join API, not a lookup.
    */
  def start(
      spark: SparkSession,
      name: String,
      kv: DataFrame,
      keyCol: String = "k",
      valueCol: String = "v",
      offsetCol: Option[String] = Some("offset"),
      registry: LookupRegistry = LookupRegistry.global,
      maxEntries: Int = 100000,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val state = scala.collection.concurrent.TrieMap.empty[String, String]
    // seed from an already-registered lookup so a restart merges instead of
    // clobbering (the reference repopulates from the topic's beginning; with
    // a checkpoint we resume from the committed offset over prior state)
    if (registry.names.contains(name)) state ++= registry.asMap(name, maxEntries)

    val writer = kv.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val perKey = offsetCol match {
          case Some(o) if batch.columns.contains(o) =>
            batch.groupBy(col(keyCol).cast("string").as("k"))
              .agg(max_by(col(valueCol).cast("string"), col(o)).as("v"))
          case _ =>
            batch.groupBy(col(keyCol).cast("string").as("k"))
              .agg(last(col(valueCol).cast("string")).as("v"))
        }
        // on-heap merge, the reference's cache.put(key, value) loop; the
        // collect is bounded by the lookup-size contract — limit(maxEntries+1)
        // keeps a runaway batch from materializing unbounded rows while the
        // +1 sentinel still lets the size check below observe the overflow
        val updates = perKey.limit(maxEntries + 1).collect()
        require(updates.length <= maxEntries,
          s"streaming lookup '$name': micro-batch carries more than $maxEntries distinct keys")
        val newKeys = updates.count(r => !state.contains(r.getString(0)))
        require(state.size + newKeys <= maxEntries,
          s"streaming lookup '$name' would exceed $maxEntries entries after merge")
        updates.foreach(r => state.put(r.getString(0), r.getString(1)))
        registerSnapshot(batch.sparkSession, name, registry, state)
      }
    val withCp = checkpointDir.fold(writer)(d => writer.option("checkpointLocation", d))
    withCp.start()
  }

  private def registerSnapshot(spark: SparkSession, name: String,
      registry: LookupRegistry, state: scala.collection.Map[String, String]): Unit = {
    import spark.implicits._
    registry.register(name, state.toSeq.toDF("k", "v"))
  }

  /** The Kafka wiring of the reference module: subscribe to a topic of
    * string key/value pairs. Not exercisable in this sandbox (no broker);
    * the MemoryStream path in StreamingLookupSpec drives the identical
    * machinery. */
  def fromKafka(spark: SparkSession, brokers: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", brokers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest") // the reference consumes from the beginning
      .load()
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v", "offset")
}
