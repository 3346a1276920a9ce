package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.functions.{BitmapAgg, BitmapMergeCardAgg}
import graft.rel.{Distribution, ExactDistinct, Tables}

class BitmapAggSpec extends SparkSpec {

  test("serialize/deserialize round-trips with trailing-zero trim") {
    val words = Array(0x8000000000000001L, 0L, 5L, 0L, 0L)
    val bytes = BitmapAgg.serialize(words)
    assert(bytes.length == 3 * 8) // trailing zero words trimmed
    assert(BitmapAgg.deserialize(bytes).toSeq == words.take(3).toSeq)
    assert(BitmapAgg.cardinality(bytes) == 4L)
  }

  test("two-level bitmap rollup equals direct distinct (property)") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    val rows = (0 until 2000).map { _ =>
      (rnd.nextInt(3), rnd.nextInt(10), rnd.nextInt(500).toLong) // (grp, day, id)
    }
    val bm = udaf(new BitmapAgg(512), Encoders.scalaLong)
    val mc = udaf(new BitmapMergeCardAgg, Encoders.BINARY)
    val got = rows.toDF("grp", "day", "id")
      .groupBy("grp", "day").agg(bm($"id").as("bmap"))
      .groupBy("grp").agg(mc($"bmap").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._3).distinct.size.toLong).toMap
    assert(got == want)
  }

  test("out-of-domain id fails loud") {
    val s = spark
    import s.implicits._
    val bm = udaf(new BitmapAgg(64), Encoders.scalaLong)
    val ex = intercept[Exception] {
      Seq(1L, 99L).toDF("id").agg(bm($"id")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("q214: weekly exact from merged partials; daily sum over-counts") {
    val s = spark
    val rows = ExactDistinct.all("q214_bitmap_rollup")
      .fn(s, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // exact weekly distinct can never exceed the sum of daily distincts,
    // and with 1500 users over busy weeks it must be strictly below
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)))
    assert(rows.exists(r => r.getLong(2) < r.getLong(3)))
  }

  test("and/andNot cardinalities agree with set arithmetic") {
    val a = {
      val b = new BitmapAgg(256)
      val buf = Seq(1L, 5L, 64L, 65L, 200L).foldLeft(b.zero)(b.reduce)
      b.finish(buf)
    }
    val c = {
      val b = new BitmapAgg(256)
      val buf = Seq(5L, 65L, 201L).foldLeft(b.zero)(b.reduce)
      b.finish(buf)
    }
    assert(BitmapAgg.andCardinality(a, c) == 2L) // {5, 65}
    assert(BitmapAgg.andNotCardinality(a, c) == 3L) // {1, 64, 200}
    assert(BitmapAgg.andNotCardinality(c, a) == 1L) // {201}
    assert(BitmapAgg.andCardinality(a, Array.emptyByteArray) == 0L)
    assert(BitmapAgg.andNotCardinality(a, Array.emptyByteArray) == 5L)
  }

  test("q220: n_both + n_a_only = |type_a audience| on the fixture") {
    val s = spark
    import s.implicits._
    val rows = ExactDistinct.all("q220_bitmap_audience")
      .fn(s, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val perType = Tables.events(s, "/root/testdata/sf0.001")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == perType(r.getString(0)))
    }
  }

  test("q221: two-pass median equals the sorted lower median") {
    val s = spark
    val cents = graft.rel.Tables.orders(s, "/root/testdata/sf0.001")
      .select(round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .filter(col("c") > 0).collect().map(_.getLong(0)).sorted
    val want = cents((cents.length - 1) / 2)
    val got = Distribution.all("q221_exact_median_twopass")
      .fn(s, "/root/testdata/sf0.001").collect().head
    assert(got.getLong(0) == cents.length.toLong)
    assert(got.getLong(1) == want)
  }

  test("q215: Theil-Sen slope is the brute-force pairwise median") {
    val s = spark
    val daily = Tables.events(s, "/root/testdata/sf0.001")
      .groupBy(col("event_type"),
        unix_date(to_date(date_trunc("DAY", col("ts")))).cast("long").as("x"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
      .collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)).toMap
    val got = Distribution.all("q215_theilsen").fn(s, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((t, pts) <- daily) {
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if i < j
      } yield (pts(j)._2 - pts(i)._2).toDouble / (pts(j)._1 - pts(i)._1)).sorted
      val lowerMed = slopes((slopes.length - 1) / 2)
      assert(math.abs(got(t) - lowerMed) < 1e-5, s"$t: ${got(t)} vs $lowerMed")
    }
  }
}
