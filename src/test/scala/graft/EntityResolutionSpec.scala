package graft

import org.apache.spark.sql.functions._
import graft.rel.EntityResolution

/** The composed ER pipeline on a hand corpus where every stage's
  * contribution is visible: blocking adjacency, score acceptance,
  * transitive clustering, and the golden-record tie-breaks.
  */
class EntityResolutionSpec extends SparkSpec {
  private def s = spark

  private def docs(rows: (Long, String, String, String, Long)*) = {
    val sp = s
    import sp.implicits._
    rows.toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("chain of matches clusters transitively; golden = longest, tie min id") {
    // three near-identical docs (same prefix → adjacent; same lang/
    // source/band → weight 2248+1848+4000 = 8096 ≥ 4000) and one
    // unrelated doc that blocks next to them but disagrees everywhere
    val d = docs(
      (1L, "alpha beta gamma", "en", "web", 100L),
      (2L, "alpha beta gamma!", "en", "web", 150L),
      (3L, "alpha beta gamma!!", "en", "web", 150L),
      (4L, "alpha zzz", "fr", "book", 900L))
    val got = EntityResolution.resolveDocuments(s, d, w = 10, matchMilli = 4000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // 4 never matches (weight -4000-2907-2248 < 0) → singleton, omitted.
    // band(100)=1, band(150)=1 → all three agree on every field.
    // golden: max n_chars = 150 shared by 2 and 3 → min id 2.
    assert(got == Set(
      (1L, 1L, 3L, 2L), (2L, 1L, 3L, 2L), (3L, 1L, 3L, 2L)))
  }

  test("pairs outside the blocking window never cluster, even if identical") {
    // identical metadata but sort keys at opposite ends of a corpus
    // larger than the window: SNM (by design) cannot see the pair
    val filler = (10L until 40L).map(i =>
      (i, f"m$i%02d filler", "de", "x", 10L))
    val d = docs(Seq(
      (1L, "aaa same", "en", "web", 100L),
      (50L, "zzz same", "en", "web", 100L)) ++ filler: _*)
    val byDoc = EntityResolution
      .resolveDocuments(s, d, w = 3, matchMilli = 4000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 1 and 50 must not share a cluster (usually neither is clustered)
    assert(byDoc.get(1L).isEmpty || byDoc.get(50L).isEmpty
      || byDoc(1L) != byDoc(50L))
  }

  test("empty match set yields an empty entity table") {
    val d = docs(
      (1L, "aaa", "en", "web", 100L),
      (2L, "aab", "fr", "book", 900L))
    assert(EntityResolution.resolveDocuments(s, d, 10, 4000L).isEmpty)
  }
}
