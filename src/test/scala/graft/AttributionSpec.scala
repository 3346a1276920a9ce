package graft

import org.apache.spark.sql.DataFrame
import graft.rel.Attribution

class AttributionSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    // (user, seq) -> synthetic ts/event_id preserving order
    rows.zipWithIndex.map { case ((u, t, ty), i) =>
      (i.toLong, new java.sql.Timestamp(86400000L + t * 1000L), u, ty)
    }.toDF("event_id", "ts", "user_id", "event_type")
  }

  private def run(rows: Seq[(Long, Long, String)], channels: Seq[String],
      iters: Int = 8): Map[String, (Long, Long, Long, Option[Long])] =
    Attribution.markovRemovalEffects(ev(rows), channels, "buy", iters = iters)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap

  test("single channel: removal kills every conversion path") {
    // u1: a then buy; u2: a, no conversion -> p_full = 1/2
    val got = run(Seq((1L, 1L, "a"), (1L, 2L, "buy"), (2L, 1L, "a")),
      Seq("a"))
    assert(got("a") == ((500000L, 0L, 1000000L, Some(1000000L))))
  }

  test("two channels: hand-computed removal effects and shares") {
    // u1: a, b, buy; u2: b (no conversion)
    // full: START->a, a->b, b->CONV, START->b, b->NULL
    //   p(b) = 1/2, p(a) = p(b), p(START) = (p(a)+p(b))/2 = 1/2
    // remove a: START->NULL, START->b; p = p(b)/2 = 1/4 -> removal 1/2
    // remove b: a and START feed NULL; p = 0 -> removal 1
    // shares: 500000/1500000 -> 333333; 1000000/1500000 -> 666666
    val got = run(Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "buy"),
      (2L, 1L, "b")), Seq("a", "b"))
    assert(got("a") == ((500000L, 250000L, 500000L, Some(333333L))))
    assert(got("b") == ((500000L, 0L, 1000000L, Some(666666L))))
  }

  test("self-loop: the fixed horizon truncates the infinite series exactly") {
    // one user: a, a, a, buy. n(a) = 3 (a->a x2, a->CONV);
    // p1(a) = 10^6 div 3 = 333333; p2(a) = (2*333333 + 10^6) div 3 = 555555
    // p3(a) = (2*555555 + 10^6) div 3 = 703703
    // START one round behind: p3(START) = p2(a) = 555555
    val rows = Seq((1L, 1L, "a"), (1L, 2L, "a"), (1L, 3L, "a"), (1L, 4L, "buy"))
    val g3 = run(rows, Seq("a"), iters = 3)
    assert(g3("a")._1 == 555555L, g3)
    val g8 = run(rows, Seq("a"), iters = 8)
    assert(g8("a")._1 > g3("a")._1 && g8("a")._1 < 1000000L,
      "monotone under-approach to the true absorption probability")
  }

  test("converter with zero prior touches contributes START->CONV") {
    // u1 converts with no touches; u2: a, no conversion.
    // full: START->CONV, START->a, a->NULL -> p(START) = 1/2
    // remove a: START->CONV, START->NULL -> p = 1/2 -> removal 0, share null
    val got = run(Seq((1L, 1L, "buy"), (2L, 1L, "a")), Seq("a"))
    assert(got("a") == ((500000L, 500000L, 0L, None)))
  }

  test("touches after the first conversion are excluded from the journey") {
    // u1: a, buy, b — the b touch is post-conversion; b never enters the
    // chain, so its removal changes nothing
    val got = run(Seq((1L, 1L, "a"), (1L, 2L, "buy"), (1L, 3L, "b")),
      Seq("a", "b"))
    assert(got("b")._3 == 0L && got("a")._3 == 1000000L)
  }

  test("zero baseline conversion raises loudly") {
    val e = intercept[Exception](run(Seq((1L, 1L, "a"), (2L, 1L, "a")),
      Seq("a")))
    assert(e.getMessage != null
      && e.getMessage.contains("baseline conversion"), e.getMessage)
  }

  test("reserved state names and duplicate channels are rejected") {
    intercept[IllegalArgumentException](run(Seq((1L, 1L, "a")), Seq("START")))
    intercept[IllegalArgumentException](run(Seq((1L, 1L, "a")), Seq("a", "a")))
    intercept[IllegalArgumentException](run(Seq((1L, 1L, "a")), Seq("buy")))
  }

  private def rules(rows: Seq[(Long, Long, String)], channels: Seq[String])
      : Map[String, (Long, Long, Long, Long)] =
    Attribution.ruleAttribution(ev(rows), channels, "buy", halfLifeDays = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("rule attribution: linear, U-shape, and decay on a 3-touch journey") {
    // one user: a, b, c, buy — same day, so decay weights are equal
    val got = rules(Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"),
      (1L, 4L, "buy")), Seq("a", "b", "c"))
    // linear: 1000 div 3 = 333 each; position: 400/200/400;
    // decay: equal ages -> 333 each
    assert(got("a") == ((333L, 400L, 333L, 1L)))
    assert(got("b") == ((333L, 200L, 333L, 1L)))
    assert(got("c") == ((333L, 400L, 333L, 1L)))
  }

  test("rule attribution: single-touch journeys take the full 1000 everywhere") {
    val got = rules(Seq((1L, 1L, "a"), (1L, 2L, "buy")), Seq("a", "b"))
    assert(got("a") == ((1000L, 1000L, 1000L, 1L)) && !got.contains("b"))
  }

  test("rule attribution: 2-touch U-shape folds the middle share into 500/500") {
    val got = rules(Seq((1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "buy")),
      Seq("a", "b"))
    assert(got("a")._2 == 500L && got("b")._2 == 500L, got)
  }

  test("rule attribution: all-ancient touches keep a floor weight, no crash") {
    // both touches ~25 half-lives before conversion: raw weights
    // truncate to 0; the floor keeps them equal at 1 micro -> 500/500
    val rows = Seq((1L, 1L, "a"), (1L, 2L, "b"),
      (1L, 25L * 86400 + 5, "buy"))
    val got = rules(rows, Seq("a", "b"))
    assert(got("a")._3 == 500L && got("b")._3 == 500L, got)
  }

  test("rule attribution: non-converters contribute nothing") {
    val got = rules(Seq((1L, 1L, "a"), (1L, 2L, "buy"), (2L, 1L, "a")),
      Seq("a"))
    assert(got("a")._4 == 1L && got("a")._1 == 1000L)
  }

  test("rule attribution: decay favors the touch nearest conversion") {
    // touches 2 days and 0 days before conversion: weights 250000 vs
    // 1000000 -> shares 200 / 800
    val rows = Seq((1L, 1L, "a"), (1L, 2L * 86400 + 1, "b"),
      (1L, 2L * 86400 + 2, "buy"))
    val got = rules(rows, Seq("a", "b"))
    assert(got("a")._3 == 200L && got("b")._3 == 800L, got)
  }
}
