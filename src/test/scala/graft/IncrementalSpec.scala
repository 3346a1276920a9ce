package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.rel.Incremental

class IncrementalSpec extends SparkSpec {

  private def li(rows: Seq[(String, String, Long, Double)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("l_returnflag", "l_linestatus", "qty", "price")
      .select(col("l_returnflag"), col("l_linestatus"),
        col("qty").cast("double").as("l_quantity"),
        col("price").as("l_extendedprice"))
  }

  private def collectState(df: DataFrame): Map[(String, String), (Long, Long, Long, Long, Long)] =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap

  test("state merged with delta equals full recompute, including disjoint keys") {
    val rnd = new scala.util.Random(31)
    val flags = Seq("A", "N", "R")
    val rows = (1 to 300).map { _ =>
      (flags(rnd.nextInt(3)), flags(rnd.nextInt(2)),
        (rnd.nextInt(50) + 1).toLong, math.rint(rnd.nextDouble() * 10000) / 100)
    }
    // split so some keys exist only in one half
    val (h1, h2raw) = rows.splitAt(150)
    val h2 = h2raw ++ Seq(("Z", "Z", 7L, 1.23)) // key only in the delta
    val merged = collectState(Incremental.mergeStates(
      Incremental.pricingState(li(h1)), Incremental.pricingState(li(h2))))
    val full = collectState(
      Incremental.pricingState(li(h1 ++ h2))
        .select("l_returnflag", "l_linestatus", "sum_qty_l", "sum_base_cents",
          "count_order", "min_qty_l", "max_qty_l"))
    assert(merged == full)
    assert(merged.contains(("Z", "Z")))
  }

  test("merge is associative across three batches") {
    val b1 = Seq(("A", "F", 5L, 10.0), ("A", "F", 3L, 20.0))
    val b2 = Seq(("A", "F", 9L, 5.5), ("N", "O", 1L, 1.0))
    val b3 = Seq(("N", "O", 2L, 2.0))
    val left = Incremental.mergeStates(
      Incremental.mergeStates(Incremental.pricingState(li(b1)),
        Incremental.pricingState(li(b2))),
      Incremental.pricingState(li(b3)))
    val right = Incremental.mergeStates(Incremental.pricingState(li(b1)),
      Incremental.mergeStates(Incremental.pricingState(li(b2)),
        Incremental.pricingState(li(b3))))
    assert(collectState(left) == collectState(right))
    // and min/max actually fold: qty range for (A,F) spans both batches
    val af = collectState(left)(("A", "F"))
    assert(af._4 == 3L && af._5 == 9L)
  }

  test("q140's streamed maintenance equals the batch aggregate on the fixture") {
    val s = spark
    val d = "/root/testdata/sf0.001"
    val streamed = graft.SparkEntry.queries("q140_stream_incr_agg")(s, d)
      .collect().map(_.toSeq).toSeq
    val batch = Incremental.pricingState(
        graft.rel.Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }
}
