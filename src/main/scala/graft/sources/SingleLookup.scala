package graft.sources

import org.apache.spark.sql.SparkSession

/** Per-lookup on-demand / polling lookups — the reference's
  * `lookups-cached-single` extension (extensions-core/lookups-cached-single/
  * src/main/java/org/apache/druid/server/lookup/): where the cached-GLOBAL
  * namespaces ([[LookupRegistry.registerFromFile]]/[[LookupRegistry
  * .registerFromJdbc]]) snapshot a whole table per poll, the single-lookup
  * module serves each lookup through its own refresh policy:
  *
  *  - [[LoadingLookup]] (LoadingLookup.java): load a key's value FROM THE
  *    SOURCE on first request ("load key if absent"), then cache it under an
  *    eviction policy — the OnHeapLoadingCache knobs (OnHeapLoadingCache
  *    .java:45-77: maximumSize, expireAfterAccess, expireAfterWrite).
  *    Reverse application (`unapply`) runs through a separate reverse
  *    loading cache keyed by value.
  *  - [[PollingLookup]] (PollingLookup.java): fetch the FULL map at
  *    construction and atomically swap in a fresh snapshot every
  *    pollPeriodMs (pollPeriodMs == 0 → load once, never re-poll).
  *
  * Scale shape: both policies are DRIVER-side structures feeding the scalar
  * LOOKUP()/map-literal path and the registry's broadcast-join path — the
  * fact table is never shuffled for a lookup. A PollingLookup publishes each
  * snapshot into a [[LookupRegistry]], so query-side visibility follows the
  * registry's generation counter exactly like every other lookup kind
  * (a plan cached against generation g never sees a newer snapshot's rows).
  *
  * The clock is injectable so TTL/poll semantics are deterministic under
  * test; production callers default to System.currentTimeMillis.
  */
object SingleLookup {

  /** DataFetcher (reference: server/lookup/DataFetcher.java:42 —
    * fetchAll / fetch / fetchKeys(value)): the pluggable source a loading or
    * polling lookup pulls from (the reference ships jdbcDataFetcher; any
    * function-backed fetcher works here). */
  trait DataFetcher {
    def fetchAll(): Map[String, String]
    def fetch(key: String): Option[String]
    def reverseFetchKeys(value: String): Seq[String] =
      fetchAll().collect { case (k, v) if v == value => k }.toSeq
    /** The source as a (key, value) relation for the QUERY path: a
      * loadingLookup registered on the config surface must be reachable
      * from LOOKUP()/registeredLookup/lookup-datasource queries (the
      * reference applies its LoadingLookup per row on the historical; a
      * distributed engine instead reads the backing source as a relation —
      * load-on-use, always-fresh, and broadcast-joinable). Default:
      * a local relation over fetchAll(). */
    def relation(spark: SparkSession): org.apache.spark.sql.DataFrame = {
      import spark.implicits._
      fetchAll().toSeq.toDF("k", "v")
    }
  }

  /** A fetcher over an in-memory (mutable) map — the spec's stand-in for
    * jdbcDataFetcher; counts calls so load-on-miss is assertable. */
  final class MapDataFetcher(source: () => Map[String, String]) extends DataFetcher {
    val fetchAllCalls = new java.util.concurrent.atomic.AtomicLong(0)
    val fetchCalls = new java.util.concurrent.atomic.AtomicLong(0)
    override def fetchAll(): Map[String, String] = {
      fetchAllCalls.incrementAndGet(); source()
    }
    override def fetch(key: String): Option[String] = {
      fetchCalls.incrementAndGet(); source().get(key)
    }
  }

  /** A fetcher over a registered JDBC table (the reference's
    * jdbcDataFetcher — JdbcDataFetcher.java issues per-key SELECTs); here
    * each fetch is a pushed-down predicate on the Spark JDBC relation. */
  final class JdbcDataFetcher(spark: SparkSession, url: String, table: String,
      keyColumn: String, valueColumn: String,
      connProps: Map[String, String] = Map.empty) extends DataFetcher {
    private def rel = {
      val props = new java.util.Properties()
      connProps.foreach { case (k, v) => props.put(k, v) }
      spark.read.jdbc(url, table, props)
    }
    override def fetchAll(): Map[String, String] =
      rel.selectExpr(s"cast($keyColumn as string)", s"cast($valueColumn as string)")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    override def fetch(key: String): Option[String] = {
      val df = rel
      df.where(df(keyColumn).cast("string") === key)
        .selectExpr(s"cast($valueColumn as string)")
        .collect().headOption.map(_.getString(0))
    }
    override def reverseFetchKeys(value: String): Seq[String] = {
      val df = rel
      df.where(df(valueColumn).cast("string") === value)
        .selectExpr(s"cast($keyColumn as string)")
        .collect().map(_.getString(0)).toSeq
    }
    /** The live JDBC relation — lookup reads push the key predicate down
      * to the source; no snapshot staleness. */
    override def relation(spark: SparkSession): org.apache.spark.sql.DataFrame =
      rel.selectExpr(s"cast($keyColumn as string) as k",
        s"cast($valueColumn as string) as v")
  }

  /** The OnHeapLoadingCache eviction knobs (OnHeapLoadingCache.java:45-77).
    * Null/absent knobs disable that policy, maximumSize == 0 evicts
    * immediately after load (the reference documents exactly that). */
  final case class CachePolicy(
      maximumSize: Option[Long] = None,
      expireAfterAccessMs: Option[Long] = None,
      expireAfterWriteMs: Option[Long] = None)

  /** A small LRU + TTL loading cache (the Guava cache the reference wraps,
    * re-derived: access-ordered LinkedHashMap for LRU, per-entry write/access
    * stamps for the TTLs). Driver-side only — entry counts are the lookup's
    * hot keyset, not the dataset. */
  final class LoadingCache[V](policy: CachePolicy, clock: () => Long) {
    private final case class Entry(value: V, var writtenAt: Long, var accessedAt: Long)
    private val map = new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)
    val loads = new java.util.concurrent.atomic.AtomicLong(0)
    val evictions = new java.util.concurrent.atomic.AtomicLong(0)

    private def expired(e: Entry, now: Long): Boolean =
      policy.expireAfterWriteMs.exists(ttl => now - e.writtenAt >= ttl) ||
        policy.expireAfterAccessMs.exists(ttl => now - e.accessedAt >= ttl)

    def get(key: String, loader: String => Option[V]): Option[V] = synchronized {
      val now = clock()
      val hit = map.get(key)
      if (hit != null && !expired(hit, now)) {
        hit.accessedAt = now
        return Some(hit.value)
      }
      if (hit != null) { map.remove(key); evictions.incrementAndGet() }
      loads.incrementAndGet()
      loader(key) match {
        case Some(v) =>
          map.put(key, Entry(v, now, now))
          // maximumSize: evict in ACCESS order; size 0 → evict the loaded
          // entry immediately (still returned to this caller)
          policy.maximumSize.foreach { max =>
            val it = map.entrySet().iterator()
            while (map.size() > max && it.hasNext) {
              it.next(); it.remove(); evictions.incrementAndGet()
            }
          }
          Some(v)
        case None => None // negative results are NOT cached (Guava load throws)
      }
    }
    def size: Int = synchronized(map.size())
    def invalidateAll(): Unit = synchronized(map.clear())
  }

  /** LoadingLookup (reference: LoadingLookup.java:44-123): load-on-miss
    * through the fetcher, forward and reverse caches independent. A null
    * key applies to null (sql-compatible mode, :71-77); a missing key is
    * null and a missing value unapplies to the empty list. */
  final class LoadingLookup(
      fetcher: DataFetcher,
      policy: CachePolicy = CachePolicy(),
      clock: () => Long = () => System.currentTimeMillis()) {
    private val cache = new LoadingCache[String](policy, clock)
    private val reverseCache = new LoadingCache[Seq[String]](policy, clock)

    def apply(key: String): Option[String] =
      if (key == null) None
      else cache.get(key, k => fetcher.fetch(k))

    def unapply(value: String): Seq[String] =
      if (value == null) Nil
      else reverseCache.get(value, v => Some(fetcher.reverseFetchKeys(v)))
        .getOrElse(Nil)

    def cacheSize: Int = cache.size
    def loadCount: Long = cache.loads.get()
    def evictionCount: Long = cache.evictions.get()
  }

  /** PollingLookup (reference: PollingLookup.java:68-93): full-snapshot
    * cache, atomically swapped per poll. `pollIfDue` is the scheduling
    * hook (the reference runs pollAndSwap on a fixed-delay executor; here
    * the cadence belongs to the caller, like registerFromJdbc's refresh);
    * `poll()` forces a swap. Each snapshot is also published to `registry`
    * under `name`, so the broadcast-join/datasource path sees the same
    * version the scalar path serves. */
  final class PollingLookup(
      spark: SparkSession,
      name: String,
      fetcher: DataFetcher,
      pollPeriodMs: Long,
      registry: LookupRegistry = LookupRegistry.global,
      clock: () => Long = () => System.currentTimeMillis()) {

    private val snapshot =
      new java.util.concurrent.atomic.AtomicReference[Map[String, String]](Map.empty)
    private var lastPollAt = Long.MinValue
    val pollCount = new java.util.concurrent.atomic.AtomicLong(0)

    poll() // the reference fetches the initial snapshot in the constructor

    /** pollAndSwap (PollingLookup.java:206-218): re-fetch and atomically
      * replace; readers of the old snapshot finish against it. */
    def poll(): Unit = synchronized {
      val fresh = fetcher.fetchAll()
      snapshot.set(fresh)
      lastPollAt = clock()
      pollCount.incrementAndGet()
      registry.registerMap(spark, name, fresh)
    }

    /** Scheduled-poll semantics: swap only when pollPeriod has elapsed;
      * pollPeriod == 0 means load-once (PollingLookup.java:88-93 skips the
      * executor entirely). */
    def pollIfDue(): Boolean = synchronized {
      if (pollPeriodMs > 0 && clock() - lastPollAt >= pollPeriodMs) {
        poll(); true
      } else false
    }

    def apply(key: String): Option[String] =
      if (key == null) None else snapshot.get().get(key)

    def unapply(value: String): Seq[String] =
      snapshot.get().collect { case (k, v) if v == value => k }.toSeq

    def close(): Unit = registry.remove(name)
  }
}
