package graft

import org.apache.spark.sql.functions._
import graft.llm.SortedNeighborhood

/** Sorted-neighborhood pairing vs the definition (row_number window +
  * positional self-join), plus the plan pin that the pair step never
  * plans an unpartitioned Window.
  */
class SnmSpec extends SparkSpec {
  private def s = spark

  test("pairs match the row_number-window definition, incl. ties") {
    val sp = s
    import sp.implicits._
    // keys with heavy ties so the id tie-break matters; enough rows to
    // span several blocks at w=3
    val df = Seq(
      (1L, "aa"), (2L, "aa"), (3L, "ab"), (4L, "aa"), (5L, "zz"),
      (6L, "ab"), (7L, "aa"), (8L, "zz"), (9L, "m"), (10L, "m")
    ).toDF("id", "key")
    val w = 3
    val got = SortedNeighborhood
      .neighborhoodPairs(df, Seq(col("key"), col("id")), "id", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: brute-force over the explicit sort order
    val order = df.collect().map(r => (r.getString(1), r.getLong(0)))
      .sortBy(identity).map(_._2)
    val want = (for {
      i <- order.indices; j <- (i + 1) until math.min(i + w, order.length)
    } yield (order(i), order(j), (j - i).toLong)).toSet
    assert(got == want)
  }

  test("every pair is within the window; volume is linear in n") {
    val sp = s
    import sp.implicits._
    val n = 500
    val df = (1 to n).map(i => (i.toLong, s"k${i % 7}")).toDF("id", "key")
    val w = 5
    val pairs = SortedNeighborhood
      .neighborhoodPairs(df, Seq(col("key"), col("id")), "id", w)
    val rows = pairs.collect()
    assert(rows.forall(r => r.getLong(2) >= 1 && r.getLong(2) < w))
    // exactly (w-1)*n - (w-1)*w/2 pairs for a full neighborhood sweep
    assert(rows.length == (w - 1) * n - (w - 1) * w / 2)
  }

  test("multi-pass union catches pairs only one key sorts adjacently") {
    val sp = s
    import sp.implicits._
    // docs 1/2 share a PREFIX; docs 3/4 share only a SUFFIX — with
    // filler pushing them far apart on the prefix key
    val filler = (10L until 40L).map(i => (i, f"f$i%02d junk", s"x$i"))
    val df = (Seq(
      (1L, "aaa same head", "t1"), (2L, "aaa same head!", "t2"),
      (3L, "bbb 123", "zz common tail"), (4L, "yyy 456", "zz common tail"))
      ++ filler.map { case (i, a, b) => (i, a, b) })
      .toDF("id", "head", "tail")
    def pairsOf(keys: Seq[Seq[org.apache.spark.sql.Column]]) =
      SortedNeighborhood.multiPassPairs(df, keys, "id", w = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val headOnly = pairsOf(Seq(Seq(col("head"), col("id"))))
    val both = pairsOf(Seq(Seq(col("head"), col("id")),
      Seq(col("tail"), col("id"))))
    assert(headOnly.contains((1L, 2L)) && !headOnly.contains((3L, 4L)))
    assert(both.contains((1L, 2L)) && both.contains((3L, 4L)))
    // union is canonical + distinct: no reversed or duplicate pairs
    assert(both.forall { case (a, b) => a < b })
  }

  test("plan: no unpartitioned Window anywhere in the pair pipeline") {
    val sp = s
    import sp.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    val plan = SortedNeighborhood
      .neighborhoodPairs(df, Seq(col("key"), col("id")), "id", 4)
      .queryExecution.sparkPlan
    // GlobalRank's spec pins its internals; this pins the INTEGRATION:
    // nothing at the SNM layer reintroduces a partition-less window
    import org.apache.spark.sql.execution.window.WindowExec
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"partition-less window in plan: ${w.simpleStringWithNodeId()}")
    }
  }
}
