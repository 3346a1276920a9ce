package graft

import org.apache.spark.sql.functions._
import graft.rel.SkewJoin

/** Salted-join parity and distribution: the salted plan must return
  * exactly the rows of the plain join, and the hot key's rows must
  * actually spread across salt values (the point of the exercise).
  */
class SkewJoinSpec extends SparkSpec {

  test("saltedEquiJoin equals the plain join on skewed data") {
    val s = spark
    import s.implicits._
    // 90% of fact rows share key 7 — the classic hot key
    val fact = (0 until 2000).map { i =>
      (if (i % 10 == 0) (i % 40).toLong else 7L, i.toLong)
    }.toDF("k", "payload")
    val dim = (0L until 40L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "name").orderBy("k", "payload")
      .collect().toSeq
    val salted = SkewJoin.saltedEquiJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "name").orderBy("k", "payload")
      .collect().toSeq
    assert(salted == plain)
  }

  test("the hot key's rows spread across all salt values") {
    val s = spark
    import s.implicits._
    val fact = (0 until 2000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val spread = fact.withColumn("__salt",
        pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)).cast("int"))
      .groupBy("__salt").count().collect()
    assert(spread.length == 8, s"expected 8 salt buckets, got ${spread.length}")
    val counts = spread.map(_.getAs[Long]("count"))
    assert(counts.min > 100, s"salt skewed: ${counts.toSeq}") // ~250 ± noise each
  }

  test("skewReport: exact counts, ppm, salt factor, pinned tie order") {
    val sp = spark
    import sp.implicits._
    // key 1: 6 rows, key 2: 2, keys 3/4: 1 each (tie broken by key asc)
    val df = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq(3L, 4L)).toDF("k")
    val got = SkewJoin.skewReport(df, "k", partitions = 4, topN = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      // 6/10 = 600000 ppm; ceil(6*4/10) = 3 salts
      (1L, 6L, 600000L, 3L),
      // 2/10 = 200000 ppm; ceil(8/10) = 1
      (2L, 2L, 200000L, 1L),
      // tie at n=1: key 3 before key 4, and only topN=3 rows
      (3L, 1L, 100000L, 1L)))
  }
}
