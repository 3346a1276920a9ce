package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import scala.util.Random
import graft.functions.{MgAgg, MgBuf}
import graft.rel.Frequency

/** Misra-Gries guarantees: the summary is a superset of every true
  * heavy hitter and each kept count undercounts by ≤ n/(k+1), under
  * both sequential reduce and distributed (partial-agg) merge trees.
  */
class MgAggSpec extends SparkSpec {

  private def zipf(n: Int, domain: Int, seed: Int): Seq[Long] = {
    val rnd = new Random(seed)
    // skewed draw: id ~ floor(domain * u^3) concentrates mass on low ids
    (0 until n).map { _ =>
      val u = rnd.nextDouble()
      (domain * u * u * u).toLong.min(domain - 1L)
    }
  }

  test("sequential reduce: superset + error bound (property)") {
    for (seed <- 1 to 3) {
      val k = 20
      val xs = zipf(5000, 500, seed)
      val agg = new MgAgg(k)
      val buf = xs.foldLeft(agg.zero)(agg.reduce)
      val out = agg.finish(buf)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val bound = xs.length.toLong / (k + 1)
      val kept = out.keys.zip(out.counts).toMap
      // every true hitter above n/(k+1) must be present
      exact.filter(_._2 > bound).keys.foreach { id =>
        assert(kept.contains(id), s"seed $seed lost hitter $id")
      }
      // kept counts never overcount and undercount by <= bound
      kept.foreach { case (id, c) =>
        assert(c <= exact(id), s"seed $seed overcount $id")
        assert(exact(id) - c <= bound, s"seed $seed bound blown for $id")
      }
    }
  }

  test("distributed merge keeps the guarantees (spark two-level)") {
    val s = spark
    import s.implicits._
    val k = 15
    val xs = zipf(4000, 300, 9)
    val mg = udaf(new MgAgg(k), Encoders.scalaLong)
    val out = xs.toDF("id").repartition(8)
      .agg(mg($"id").as("s")).collect().head
      .getAs[org.apache.spark.sql.Row]("s")
    val kept = out.getSeq[Long](0).zip(out.getSeq[Long](1)).toMap
    val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = xs.length.toLong / (k + 1)
    exact.filter(_._2 > bound).keys.foreach { id =>
      assert(kept.contains(id), s"merge lost hitter $id")
    }
    kept.foreach { case (id, c) =>
      assert(c <= exact(id) && exact(id) - c <= bound, s"merge bound $id")
    }
    assert(kept.size <= k)
  }

  test("q224: exact recount matches brute force on the fixture") {
    val s = spark
    val got = Frequency.all("q224_mg_heavy_hitters")
      .fn(s, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.rel.Tables.events(s, "/root/testdata/sf0.001")
      .select(col("user_id").cast("long")).collect().map(_.getLong(0))
    val want = ev.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 * 125 > ev.length).map { case (u, n) => (u, n) }.toSet
    assert(got == want)
    assert(got.nonEmpty) // the fixture has hitters; an empty pass is a bug
  }
}
