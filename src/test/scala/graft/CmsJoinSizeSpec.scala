package graft

import graft.llm.SketchAggOps

/** CMS join-size estimate (llm/SketchAggOps.cmsJoinSize): the
  * overestimate guarantee, the hand-computed exact size, empty-join
  * handling, and determinism.
  */
class CmsJoinSizeSpec extends SparkSpec {

  private def keys(ks: Seq[String]) = {
    val s = spark
    import s.implicits._
    ks.toDF("k")
  }

  test("exact size is the per-key product sum; the estimate bounds it") {
    val a = keys(Seq("a", "a", "a", "b", "b"))
    val b = keys(Seq("a", "a", "a", "a", "c", "c", "c", "c", "c"))
    val r = SketchAggOps.cmsJoinSize(a, "k", b, "k").collect()(0)
    assert(r.getLong(0) == 12L, s"exact 3*4: $r")
    assert(r.getLong(1) >= 12L && r.getBoolean(2), s"$r")
  }

  test("an empty join reports zero, not a division error") {
    val r = SketchAggOps.cmsJoinSize(keys(Seq("a", "b")), "k",
      keys(Seq("c", "d")), "k").collect()(0)
    assert(r.getLong(0) == 0L && r.getBoolean(2) && r.isNullAt(3), s"$r")
  }

  test("re-running is bit-deterministic") {
    val a = keys((1 to 100).map(i => s"k${i % 7}"))
    val b = keys((1 to 80).map(i => s"k${i % 5}"))
    val x = SketchAggOps.cmsJoinSize(a, "k", b, "k")
      .collect().map(_.toSeq).toSeq
    val y = SketchAggOps.cmsJoinSize(a, "k", b, "k")
      .collect().map(_.toSeq).toSeq
    assert(x == y)
  }
}
