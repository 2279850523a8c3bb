package graft

import graft.sources.{Sinks, StoreCache}

class StoreCacheSpec extends SparkSpec {
  import spark.implicits._

  test("table(): skips only when marker AND catalog agree; fresh catalog or new key rebuilds") {
    sys.props("graft.store.cache") = "1"
    try {
      var builds = 0
      def build(): Unit = {
        builds += 1
        Sinks.parquetTable(Seq((1L, 2L)).toDF("a", "b"), "graft_sc_t1")
      }
      def call(key: String): Unit =
        StoreCache.table(spark, "graft_sc_t1", key, Seq("graft_sc_t1"))(build())
      call("k1")
      assert(builds === 1)
      call("k1")
      assert(builds === 1, "matching marker + live table must skip")
      // the regression a repeated gate run exposed: table directories
      // survive the JVM, the in-memory catalog does not — a marker
      // alone must NOT skip the build
      spark.sql("DROP TABLE graft_sc_t1")
      call("k1")
      assert(builds === 2, "marker without a catalog entry must rebuild")
      call("k2")
      assert(builds === 3, "a different fixture key must rebuild")
      call("k2")
      assert(builds === 3)
    } finally sys.props.remove("graft.store.cache")
  }

  test("model(): memoizes only while enabled") {
    var builds = 0
    def make(): java.lang.Long = { builds += 1; java.lang.Long.valueOf(7L) }
    // disabled (default): every call builds
    StoreCache.model("graft_sc_m1")(make())
    StoreCache.model("graft_sc_m1")(make())
    assert(builds === 2)
    sys.props("graft.store.cache") = "1"
    try {
      StoreCache.model("graft_sc_m1")(make())
      StoreCache.model("graft_sc_m1")(make())
      assert(builds === 3, "enabled: second call must hit the memo")
    } finally sys.props.remove("graft.store.cache")
  }
}
