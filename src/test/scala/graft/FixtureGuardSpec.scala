package graft

import graft.rel.Tables

/** Entries whose oracles pin literal VALUES measured on sf0.01 must
  * FAIL LOUD on any other fixture (same row counts at sf0.001, so only
  * a content fingerprint can tell) instead of going hash-red on
  * correct code.
  */
class FixtureGuardSpec extends SparkSpec {

  test("pinned-recall entries throw a clear message on the wrong fixture") {
    val e = intercept[IllegalStateException] {
      SparkEntry.queries("q55_pq_recall")(spark, "/root/testdata/sf0.001").collect()
    }
    assert(e.getMessage.contains("sf0.01") && e.getMessage.contains("fingerprint"))
  }

  test("BPE pinned entries throw a clear message on the wrong fixture") {
    val e = intercept[IllegalStateException] {
      SparkEntry.queries("q72_bpe_merges")(spark, "/root/testdata/sf0.001").collect()
    }
    assert(e.getMessage.contains("q72") && e.getMessage.contains("sf0.01"))
  }

  test("the right fixture passes the guard (and the fingerprint caches)") {
    Tables.requirePinnedFixture(spark, "/root/testdata/sf0.01", "embeddings",
      Tables.Sf001EmbeddingsFp, "spec")
    Tables.requirePinnedFixture(spark, "/root/testdata/sf0.01", "documents",
      Tables.Sf001DocumentsFp, "spec")
  }
}
