package graft

import org.apache.spark.sql.functions._
import graft.rel.Privacy

/** k-anonymity audit + suppression semantics on hand data: exact k and
  * l per group, null-sensitive handling, and the suppression transform
  * nulling QI columns only in sub-threshold groups.
  */
class PrivacySpec extends SparkSpec {
  private def s = spark

  private def people = {
    val sp = s
    import sp.implicits._
    Seq(
      // (zip, age_band, disease)
      ("02139", "20-30", "flu"), ("02139", "20-30", "flu"),
      ("02139", "20-30", "cold"),                    // k=3, l=2
      ("02139", "30-40", "flu"),                     // k=1, l=1
      ("94110", "20-30", "flu"), ("94110", "20-30", "cold"),
      ("94110", "20-30", "asthma"), ("94110", "20-30", "flu"),
      ("94110", "20-30", null)                       // k=5, l=3 (null excluded)
    ).toDF("zip", "age", "disease")
  }

  test("audit computes exact k and l; nulls excluded from l") {
    val got = Privacy.kAnonymityAudit(people, Seq("zip", "age"),
        col("disease"), minK = 3L, minL = 3L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got(("02139", "20-30")) == ((3L, 2L, false, true)))
    assert(got(("02139", "30-40")) == ((1L, 1L, true, true)))
    assert(got(("94110", "20-30")) == ((5L, 3L, false, false)))
  }

  test("suppression nulls QI columns exactly on sub-k groups") {
    val out = Privacy.suppressSmallGroups(people, Seq("zip", "age"), 3L)
      .collect()
    assert(out.length == people.count())
    val suppressed = out.filter(r => r.isNullAt(0) || r.isNullAt(1))
    // only the k=1 group is suppressed — both QI cols nulled, payload kept
    assert(suppressed.length == 1)
    assert(suppressed.head.isNullAt(0) && suppressed.head.isNullAt(1)
      && suppressed.head.getString(2) == "flu")
    // compliant groups untouched
    assert(out.count(r => r.getString(0) == "94110") == 5)
  }

  test("generalizeNumericQi picks the smallest qualifying width") {
    val sp = s
    import sp.implicits._
    // values 0..7 in one category: width 1 → k=1 per bucket (fails
    // k=4); width 2 → k=2 (fails); width 4 → k=4 (qualifies)
    val df = (0L to 7L).map(v => ("a", v)).toDF("cat", "v")
    val got = Privacy.generalizeNumericQi(df, "cat", col("v"),
        widths = Seq(1L, 2L, 4L, 8L), minK = 4L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set(("a", 4L, 0L, 4L), ("a", 4L, 1L, 4L)))
  }

  test("generalizeNumericQi: no qualifying width yields an empty result") {
    val sp = s
    import sp.implicits._
    // two categories of 2 rows each can never reach k=3 at any width
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("cat", "v")
    assert(Privacy.generalizeNumericQi(df, "cat", col("v"),
      widths = Seq(1L, 1024L), minK = 3L).isEmpty)
  }

  test("single QI column and all-compliant data yield no violations") {
    val sp = s
    import sp.implicits._
    val df = (1 to 20).map(i => ("a", s"v${i % 4}")).toDF("g", "x")
    val row = Privacy.kAnonymityAudit(df, Seq("g"), col("x"), 10L, 4L)
      .collect().head
    assert(row.getLong(1) == 20L && row.getLong(2) == 4L
      && !row.getBoolean(3) && !row.getBoolean(4))
  }

  test("t-closeness: ordered EMD matches hand arithmetic, including absent values") {
    val sp = s
    import sp.implicits._
    // global over values {1,2,3}: g = (2,2,2), n = 6, m = 3
    // group a = {1,1}: p=(1,0,0), q=(1/3,1/3,1/3)
    //   cum diffs |1-1/3|=2/3, |1-2/3|=1/3 -> t = (2/3+1/3)/2 = 1/2
    // group b = {2,3,2,3}: p=(0,1/2,1/2)
    //   cum |0-1/3|=1/3, |1/2-2/3|=1/6 -> t = (1/3+1/6)/2 = 1/4
    val df = Seq(("a", 1L), ("a", 1L), ("b", 2L), ("b", 3L), ("b", 2L),
      ("b", 3L)).toDF("g", "v")
    val got = Privacy.tClosenessAudit(df, Seq("g"), col("v"), tMilli = 300L)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(got("a") == (500L, true))
    assert(got("b") == (250L, false))
  }

  test("t-closeness: a group matching the global distribution scores 0") {
    val sp = s
    import sp.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val got = Privacy.tClosenessAudit(df, Seq("g"), col("v"), 100L)
      .collect()
    got.foreach(r => assert(r.getLong(2) == 0L && !r.getBoolean(3)))
  }

  test("t-closeness: single-value domain (m = 1) scores 0 by convention") {
    val sp = s
    import sp.implicits._
    val df = Seq(("a", 5L), ("b", 5L), ("b", 5L)).toDF("g", "v")
    Privacy.tClosenessAudit(df, Seq("g"), col("v"), 100L).collect()
      .foreach(r => assert(r.getLong(2) == 0L))
  }
}
