package graft.index

/** Executor-JVM-local cache of per-shard graphs, shared by the sharded
  * graph families ([[ShardedHnsw]], [[ShardedVamana]]) — each holds its
  * own instance (budgets and invalidation never cross families).
  *
  * Semantics (documented in detail at [[ShardedHnsw]], the original
  * holder of this logic): entries key by (cacheKey, shard); keys carry a
  * data version after the last '#' and inserting a new version purges
  * same-stable older-version entries in this JVM; after an insert, total
  * cached size above the budget evicts least-recently-used entries
  * (never the one just inserted). `sizeOf` is the budget unit (live
  * graph nodes). */
private[index] final class ShardGraphCache[G <: AnyRef](sizeOf: G => Long) {

  private final class Entry(val graph: G) {
    @volatile var lastAccess: Long = System.nanoTime()
  }
  private val cache = scala.collection.concurrent.TrieMap.empty[(String, Int), Entry]

  /** Evictions whose victim shares the just-inserted key's stable prefix
    * — the budget is smaller than one generation and the cache thrashes
    * sibling shards (100% miss from then on; correctness unaffected).
    * Exposed so operators can alarm on budget-too-small. */
  private val samePrefixEvictionCount = new java.util.concurrent.atomic.AtomicLong(0)
  def samePrefixEvictions: Long = samePrefixEvictionCount.get()

  /** Drop every cached shard graph whose cacheKey starts with `prefix`.
    * Calling-JVM only — clusters invalidate via version-suffixed keys. */
  def clearCache(prefix: String): Unit =
    cache.keys.filter(_._1.startsWith(prefix)).foreach(cache.remove)

  def cachedNodeCount: Long =
    cache.values.iterator.map(e => sizeOf(e.graph)).sum

  /** Fold the shard count into the STABLE key part (before any
    * '#version' suffix): graphs built under a different partitioning
    * must be a guaranteed cache miss. */
  def withShardCount(key: String, nShards: Int): String = {
    if (key.isEmpty) return key
    val sep = key.lastIndexOf('#')
    if (sep > 0) key.substring(0, sep) + "|n" + nShards + key.substring(sep)
    else key + "|n" + nShards
  }

  /** Executor-side cache access; see class doc for the version-purge and
    * LRU-budget rules. */
  def cachedGraph(key: String, shard: Int, maxNodes: Long)(build: => G): G = {
    if (key.isEmpty) return build
    val sep = key.lastIndexOf('#')
    if (sep > 0) {
      val stable = key.substring(0, sep + 1)
      cache.keys.foreach { k =>
        if (k._1.startsWith(stable) && k._1 != key) cache.remove(k)
      }
    }
    val existing = cache.get((key, shard))
    if (existing.isDefined) {
      existing.get.lastAccess = System.nanoTime()
      return existing.get.graph
    }
    val entry = cache.getOrElseUpdate((key, shard), new Entry(build))
    entry.lastAccess = System.nanoTime()
    val stablePrefix =
      if (sep > 0) key.substring(0, sep + 1) else key
    var total = cachedNodeCount
    while (total > maxNodes && cache.size > 1) {
      val lru = cache.iterator
        .filter(_._1 != (key, shard))
        .minByOption(_._2.lastAccess)
      lru match {
        case Some((k, _)) =>
          // decrement only when WE removed it — a concurrent evictor may
          // have beaten us, and double-subtracting would let the loop
          // exit while the cache is still over budget
          cache.remove(k).foreach { r =>
            total -= sizeOf(r.graph)
            if (k._1.startsWith(stablePrefix))
              samePrefixEvictionCount.incrementAndGet()
          }
        case None => return entry.graph
      }
    }
    entry.graph
  }
}
