package graft.sources

import org.apache.spark.sql.SparkSession

/** Gate-time build caching (round 8, verdict item #7): many driver
  * queries construct the SAME seeded index/model over the SAME fixture
  * — six AnnForest(50,5,42) fits, three DistributedAnnForest fits,
  * three PQ codebooks, two IVF quantizers, four full-corpus BM25
  * builds — because each query is self-contained by design. Fits are
  * deterministic (seeded, and the driver fixtures are immutable), so
  * rebuilding per query certifies nothing the first build didn't; it
  * only grows gate wall-time linearly with the query universe.
  *
  * OFF by default: specs, ad-hoc runs and the BENCH record the real
  * build cost (bench numbers must stay comparable across rounds —
  * a cache would turn q35's fit+serve into serve-only on runs 2-3).
  * `graft.Verify` opts in via -Dgraft.store.cache=1: within one gate
  * run (and across runs over the same warehouse + fixture), each
  * distinct (key, fixture) build happens once.
  *
  * Correctness: [[model]] memoizes immutable fitted models in-JVM
  * (every serving op on them returns new frames/models); [[table]]
  * skips a warehouse-table build only when a marker records the SAME
  * key — the key must encode the fixture dir plus a layout version the
  * author bumps when the build's code changes shape (the conservative
  * cross-run guard; a torn build never writes its marker, so it always
  * rebuilds). Callers that MUTATE cached tables must restore pristine
  * state per use (e.g. dropping the tombstone side-table) — the shared
  * stores are only offered where that restore is total.
  */
object StoreCache {

  def enabled: Boolean =
    sys.props.get("graft.store.cache").contains("1") ||
      sys.env.get("GRAFT_STORE_CACHE").contains("1")

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  /** Memoize an immutable fitted model under `key` for this JVM. */
  def model[T <: AnyRef](key: String)(build: => T): T =
    if (!enabled) build
    else memo.computeIfAbsent(key, _ => build).asInstanceOf[T]

  /** Run `build` (which writes warehouse tables for `name`) unless a
    * marker records that the same `key` already built them AND every
    * `probeTables` entry is present in the session catalog. The
    * catalog probe is what bounds the cache to one JVM in practice:
    * table directories survive on disk, but the in-memory catalog does
    * not — a marker alone would skip the build and then fail the first
    * read with TABLE_OR_VIEW_NOT_FOUND (exactly what a repeated gate
    * run over the same warehouse exposed). */
  def table(spark: SparkSession, name: String, key: String,
      probeTables: Seq[String])(build: => Unit): Unit = {
    if (!enabled) { build; return }
    val p = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      name.toLowerCase(java.util.Locale.ROOT) + "__cachekey")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val have =
      if (!fs.exists(p)) null
      else {
        val in = fs.open(p)
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
    if (have == key && probeTables.forall(spark.catalog.tableExists)) return
    if (fs.exists(p)) fs.delete(p, false)
    build
    val out = fs.create(p, true)
    try out.write(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
