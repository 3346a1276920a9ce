package graft

import org.apache.spark.sql.DataFrame
import graft.llm.Decontam

class DecontamSpec extends SparkSpec {

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  private def audit(train: Seq[(Long, String)], eval: Seq[(Long, String)],
      n: Int): Map[Long, (Long, Long, String)] =
    Decontam.contaminationAudit(spark, docs(train), docs(eval), n)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("planted leak is flagged with the colliding gram; clean docs are not") {
    val got = audit(
      train = Seq(
        (1L, "the quick brown fox jumps over dogs"),
        (2L, "completely unrelated words here only")),
      eval = Seq((100L, "we saw the quick brown fox yesterday")),
      n = 4)
    // doc 1 shares "the quick brown fox" (and only it, as a 4-gram)
    assert(got == Map(1L -> ((1L, 1L, "the quick brown fox"))))
  }

  test("a gram shared with two eval docs counts both, grams stay distinct") {
    val got = audit(
      train = Seq((1L, "a b c d e")),
      eval = Seq((100L, "a b c d"), (101L, "x a b c d y"), (102L, "b c d e")),
      n = 4)
    // train grams: "a b c d", "b c d e"; eval hits: 100+101 on the first,
    // 102 on the second
    assert(got == Map(1L -> ((2L, 3L, "a b c d"))))
  }

  test("docs shorter than n words carry no grams (the q264 sequence lesson)") {
    val got = audit(
      train = Seq((1L, "too short"), (2L, ""), (3L, "a b c d")),
      eval = Seq((100L, "a b c d"), (101L, "x")),
      n = 4)
    assert(got == Map(3L -> ((1L, 1L, "a b c d"))))
  }

  test("tokenization normalizes case and whitespace runs") {
    val got = audit(
      train = Seq((1L, "  The   QUICK\tbrown   fox  ")),
      eval = Seq((100L, "the quick brown fox")),
      n = 4)
    assert(got.contains(1L))
  }

  test("plan shape: the eval gram table is broadcast, train grams never shuffle") {
    val plan = Decontam.contaminationAudit(spark,
        docs(Seq((1L, "a b c d e"))), docs(Seq((2L, "a b c d"))), 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("n bounds are rejected") {
    intercept[IllegalArgumentException](audit(Seq((1L, "a")), Seq((2L, "a")), 1))
    intercept[IllegalArgumentException](audit(Seq((1L, "a")), Seq((2L, "a")), 33))
  }

  test("streaming-legal twin produces identical rows to the batch audit") {
    val train = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "a b c d e"),
      (3L, "nothing shared here at all"))
    val eval = Seq((100L, "we saw the quick brown fox yesterday"),
      (101L, "x a b c d y"), (102L, "b c d e"))
    val b = Decontam.contaminationAudit(spark, docs(train), docs(eval), 4)
      .collect().map(_.toSeq).toSeq
    val st = Decontam.contaminationAuditStream(docs(train), docs(eval), 4)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(b == st)
  }
}
