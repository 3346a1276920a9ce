package graft

import org.apache.spark.sql.functions._
import graft.functions.{CmsAgg, CmsBuf}

/** The Count-Min sketch: never underestimates, counters are invariant
  * to input partitioning (merge = elementwise add), and the total mass
  * per depth row equals the stream length.
  */
class CmsSpec extends SparkSpec {

  private val depth = 4
  private val width = 64

  private def idxOf(t: String, i: Int): Long = {
    val md5hex = java.security.MessageDigest.getInstance("MD5")
      .digest((t + "#" + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md5hex.take(7), 16) % width
  }

  private def sketchOf(tokens: Seq[String], parts: Int): CmsBuf = {
    val s = spark
    import s.implicits._
    val agg = new CmsAgg(depth, width)
    val (d, w) = (depth, width) // locals only: the closure must not drag the suite along
    tokens.toDF("t").repartition(parts)
      .select(col("t")).as[String]
      .map { t =>
        (0 until d).map { i =>
          val md5hex = java.security.MessageDigest.getInstance("MD5")
            .digest((t + "#" + i).getBytes("UTF-8")).map("%02x".format(_)).mkString
          java.lang.Long.parseLong(md5hex.take(7), 16) % w
        }
      }
      .select(agg.toColumn)
      .head()
  }

  test("estimates never underestimate; row mass equals stream length") {
    val r = new scala.util.Random(31)
    val tokens = Seq.fill(5000)(s"tok${r.nextInt(300)}")
    val cms = sketchOf(tokens, 5)
    val exact = tokens.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    exact.foreach { case (t, n) =>
      val est = CmsAgg.estimate(cms, (0 until depth).map(i => idxOf(t, i)), depth, width)
      assert(est >= n, s"underestimated '$t': $est < $n")
    }
    (0 until depth).foreach { i =>
      val mass = (0 until width).map(j => cms.counters(i * width + j)).sum
      assert(mass == tokens.length, s"row $i mass $mass != ${tokens.length}")
    }
  }

  test("counters are invariant to input partitioning") {
    val r = new scala.util.Random(57)
    val tokens = Seq.fill(2000)(s"w${r.nextInt(100)}")
    assert(sketchOf(tokens, 1).counters.toSeq == sketchOf(tokens, 8).counters.toSeq)
  }
}
