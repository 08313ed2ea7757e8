package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-materialization-per-run registry for intermediates shared by
  * SEVERAL registered queries (r6 verdict stretch 8).
  *
  * In-memory `persist` cannot serve this role: Verify and Bench call
  * `spark.catalog.clearCache()` after every query (by design — 171
  * queries each pinning their own caches would accumulate), which also
  * evicts any cross-query pool, so each consumer re-paid the full build
  * (measured: d07 + p06 each rebuilt the shingle→contamination-pair
  * subtree, 2.8 s + 4.3 s warm at sf0.1). Instead the pool is
  * MATERIALIZED once to a per-JVM temp parquet and consumers read that —
  * exactly the stage-boundary materialization a 100 TB pipeline would
  * use between assembly and its consumers, and immune to clearCache.
  *
  * Hash-safety: only exact-typed columns (strings/longs/exact decimals)
  * may ride through a pool — parquet round-trips them bitwise. The pool
  * is keyed by (session, dir, name) and lives in a fresh temp dir per
  * JVM, so a rewritten fixture dir can never serve a stale pool across
  * runs.
  */
object SharedPools {
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_pools_").toString
  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Build `df` at most once per (session, dir, key): first caller pays
    * the build + a parquet write; every caller (including the first)
    * gets a plain parquet scan of the materialized result.
    *
    * The build runs OUTSIDE the map's lock (check-then-putIfAbsent, not
    * computeIfAbsent): pool builds may consume OTHER pools — d08's
    * cluster pool reads the jaccard-pair pool — and a nested
    * computeIfAbsent on one ConcurrentHashMap throws "Recursive
    * update". A racing duplicate build writes the same deterministic
    * bytes to the same path with mode=overwrite, so losing the
    * putIfAbsent race is waste, never wrongness (and Verify/Bench drive
    * queries single-threaded anyway). */
  def materialized(s: SparkSession, d: String, key: String)(build: => DataFrame): DataFrame = {
    built.keySet.removeIf(k => k._1.sparkContext.isStopped)
    val mapKey = (s, d, key)
    val existing = built.get(mapKey)
    if (existing != null) existing
    else {
      val path = s"$root/${key}_${Integer.toHexString(d.hashCode)}"
      build.write.mode("overwrite").parquet(path)
      val df = s.read.parquet(path)
      val prev = built.putIfAbsent(mapKey, df)
      if (prev != null) prev else df
    }
  }
}
