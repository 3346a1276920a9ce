package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException
import graft.streaming.StreamingOps

/** The q127 streaming EWMA beyond what the single-batch driver entry can
  * show: state carried across micro-batches reproduces the batch
  * recurrence, and out-of-order arrival fails loud instead of silently
  * corrupting it.
  */
class StreamEwmaSpec extends SparkSpec {

  private def drive(name: String, batches: Seq[Seq[(Long, Int, Long)]]): Map[Long, (Long, Int, Long)] = {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Long, Int, Long)]
    val q = StreamingOps.ewmaStream(mem.toDS())
      .toDF("k", "n_days", "last_day", "smooth")
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    // last emission per key wins (n_days strictly grows)
    s.table(name).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).maxBy(_._1) }
  }

  test("state carries across batches: split stream equals one-shot recurrence") {
    // days 1..4 for key 1: s=100, (200+300)/4=125, (40+375)/4=103, (100+309)/4=102
    val all = Seq((1L, 1, 100L), (1L, 2, 200L), (1L, 3, 40L), (1L, 4, 100L))
    val oneShot = drive("ewma_oneshot", Seq(all))
    val split = drive("ewma_split", Seq(all.take(2), all.drop(2)))
    assert(oneShot(1L) == ((4L, 4, 102L)))
    assert(split(1L) == oneShot(1L))
  }

  test("same-batch duplicate days aggregate before the fold") {
    // day 1 arrives as two events 60+40: s1 = 100
    val got = drive("ewma_dupday", Seq(Seq((2L, 1, 60L), (2L, 1, 40L), (2L, 2, 200L))))
    assert(got(2L) == ((2L, 2, 125L)))
  }

  test("a batch older than the folded horizon fails loud") {
    val s = spark
    import s.implicits._
    implicit val ctx = s.sqlContext
    val mem = MemoryStream[(Long, Int, Long)]
    val q = StreamingOps.ewmaStream(mem.toDS())
      .toDF("k", "n_days", "last_day", "smooth")
      .writeStream.format("memory").queryName("ewma_ooo").outputMode("update").start()
    try {
      mem.addData((3L, 5, 10L)); q.processAllAvailable()
      mem.addData((3L, 4, 10L)) // day 4 after day 5 was folded
      val e = intercept[StreamingQueryException] { q.processAllAvailable(); q.awaitTermination() }
      assert(e.getMessage.contains("out-of-order") ||
        Option(e.getCause).exists(_.getMessage.contains("out-of-order")))
    } finally q.stop()
  }
}
