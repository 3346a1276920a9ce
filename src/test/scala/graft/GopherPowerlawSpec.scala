package graft

import org.apache.spark.sql.functions._
import graft.llm.Curation
import graft.graph.Assortativity

/** Gopher structural quality rules (q418) and the degree power-law
  * fit (q419).
  */
class GopherPowerlawSpec extends SparkSpec {

  test("gopherQualityRules: each rule flags its planted violator") {
    val s = spark
    import s.implicits._
    def words(n: Int, w: String = "word") = Seq.fill(n)(w)
    val clean = (words(30, "the") ++ words(30, "data")).mkString(" ")
    val docs = Seq(
      (1L, clean, "clean"),
      (2L, words(10, "the").mkString(" "), "short"), // < 50 words
      (3L, (words(58, "ab") ++ words(2, "a")).mkString(" "),
        "short"), // mean word len 1.97 < 3 (and "a" keeps 2 stops)
      (4L, (Seq.fill(60)("##??!!") ++ words(2, "the")).mkString(" "),
        "symbols"), // no alpha in most words + symbol ratio
      (5L, words(60, "data").mkString(" "), "nostop") // 0 stop words
    ).toDF("doc_id", "text", "source")
    val got = Curation.gopherQualityRules(s, docs)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // (n_docs, nwords, wordlen, alpha, symbol, stop, any)
    assert(got("clean") == ((1L, 0L, 0L, 0L, 0L, 0L, 0L)), got)
    assert(got("short")._2 == 1L, got)   // doc 2 word-count flag
    assert(got("short")._3 == 1L, got)   // doc 3 mean-word-length flag
    assert(got("symbols") == ((1L, 0L, 0L, 1L, 1L, 0L, 1L)), got)
    assert(got("nostop") == ((1L, 0L, 0L, 0L, 0L, 1L, 1L)), got)
  }

  test("degreePowerlaw: a planted star yields the hub degree and a negative slope") {
    val s = spark
    import s.implicits._
    // star K_{1,20} plus a 10-cycle: degrees {20: 1 node, 1: 20, 2: 10}
    val star = (1L to 20L).map(i => (0L, 100L + i))
    val cyc = (0 until 10).map(i => (200L + i, 200L + (i + 1) % 10))
    val e = (star ++ cyc).toDF("a", "b")
    val r = Assortativity.degreePowerlaw(s, e).collect()(0)
    assert(r.getLong(0) == 31L, s"n_nodes: $r")
    assert(r.getLong(1) == 30L, s"n_edges: $r")
    assert(r.getLong(2) == 20L, s"max_degree: $r")
    assert(r.getLong(3) == 3L, s"n_points: $r")
    assert(r.getLong(4) < 0L, s"slope_micro must be negative: $r")
  }
}
