package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.immutable.ListMap
import graft.rel.RelQueries.Q
import graft.rel.Tables

/** SEQUENTIAL PATTERN MINING (the PrefixSpan problem, Pei et al.
  * 2001), patterns up to length 3 over a BOUNDED item alphabet: which
  * ordered item subsequences (not necessarily contiguous — the
  * standard semantics) appear in at least `minSupport` keys'
  * event sequences? The q170 session-paths entry counts exact
  * contiguous paths; this is the subsequence generalization the
  * funnel/journey analyses actually ask for ("signup … later purchase
  * … later refund, anything in between").
  *
  * The subsequence-existence tests reduce to per-(key, item) position
  * summaries instead of a combinatorial scan:
  *   - ⟨a, b⟩ ⊆ seq  ⇔  first_pos(a) < last_pos(b)
  *   - ⟨a, b, c⟩ ⊆ seq  ⇔  (min b-position AFTER first_pos(a)) <
  *     last_pos(c)
  * both exact (choosing the earliest feasible positions greedily is
  * optimal for subsequence matching). All positions are integers from
  * one ranked pass; supports are COUNT(DISTINCT key) hash
  * aggregations.
  *
  * Scale shape: the corpus collapses once to (key, item, pos) and the
  * per-(key, item) min/max table; every level is a key-co-located
  * join whose per-key fan-out is |alphabet|-bounded — the loud
  * 64-item guard keeps the per-key pattern space ≤ 64³ (a 100 TB run
  * over raw ids must dictionary-bucket items first, exactly like the
  * splitGains binning rule). No sequence is ever materialized as an
  * array; nothing scans the 2^n subsequence space.
  *
  * Output, ordered: (pattern 'a>b', len, support) with support ≥
  * `minSupport`, lengths 1–3.
  */
object SeqMine {

  private val AlphabetCap = 64L

  def frequentSequences(df: DataFrame, key: String, ord: String,
      tie: String, item: String, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport >= 1: $minSupport")
    val pos = df.select(col(key).as("k"), col(item).cast("string").as("it"),
        col(ord).as("o"), col(tie).as("t"))
      .withColumn("p", row_number().over(
        Window.partitionBy("k").orderBy(col("o"), col("t"))))
      .select(col("k"), col("it"), col("p"))
      .localCheckpoint(true)
    val nItems = pos.select("it").distinct()
      .select(count(lit(1)).as("c"))
    val st = pos.groupBy("k", "it")
      .agg(min(col("p")).as("mn"), max(col("p")).as("mx"))
      .crossJoin(broadcast(nItems))
      .select(col("k"),
        when(col("c") > AlphabetCap, raise_error(concat(
          lit(s"frequentSequences: alphabet exceeds $AlphabetCap items ("),
          col("c").cast("string"),
          lit(") — dictionary-bucket the items first"))))
          .otherwise(col("it")).as("it"),
        col("mn"), col("mx"))
      .localCheckpoint(true)
    val sup1 = st.groupBy(col("it"))
      .agg(countDistinct(col("k")).as("support"))
      .select(col("it").as("pattern"), lit(1).as("len"), col("support"))
    val a = st.select(col("k"), col("it").as("ia"), col("mn").as("amn"))
    val b = st.select(col("k"), col("it").as("ib"), col("mx").as("bmx"))
    val l2 = a.join(b, "k").filter(col("amn") < col("bmx"))
    val sup2 = l2.groupBy("ia", "ib")
      .agg(countDistinct(col("k")).as("support"))
      .select(concat(col("ia"), lit(">"), col("ib")).as("pattern"),
        lit(2).as("len"), col("support"))
    // min b-position strictly after a's first position, per (k, a, b)
    val mid = a.join(pos.select(col("k"), col("it").as("ib"),
        col("p").as("bp")), "k")
      .filter(col("bp") > col("amn"))
      .groupBy("k", "ia", "ib").agg(min(col("bp")).as("pab"))
    val c = st.select(col("k"), col("it").as("ic"), col("mx").as("cmx"))
    val l3 = mid.join(c, "k").filter(col("pab") < col("cmx"))
    val sup3 = l3.groupBy("ia", "ib", "ic")
      .agg(countDistinct(col("k")).as("support"))
      .select(concat(col("ia"), lit(">"), col("ib"), lit(">"), col("ic"))
        .as("pattern"), lit(3).as("len"), col("support"))
    sup1.unionByName(sup2).unionByName(sup3)
      .filter(col("support") >= minSupport)
      .orderBy("len", "pattern")
  }

  val all: ListMap[String, Q] = ListMap(
    // ---- q362: frequent event-type subsequences of user journeys
    //      (support = distinct users, threshold 5) — the oracle
    //      replays the ranked positions, the first/last-position
    //      subsequence tests, the greedy middle-position rule, and the
    //      distinct-key supports. ----
    "q362_seq_patterns" -> Q(
      (s, d) => frequentSequences(Tables.events(s, d),
        "user_id", "ts", "event_id", "event_type", minSupport = 5L),
      Some("""WITH pos AS (SELECT user_id AS k, event_type AS it,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS p
             |  FROM events),
             |st AS (SELECT k, it, min(p) AS mn, max(p) AS mx
             |  FROM pos GROUP BY k, it),
             |s1 AS (SELECT it AS pattern, 1 AS len,
             |    count(DISTINCT k) AS support FROM st GROUP BY it),
             |l2 AS (SELECT a.k, a.it AS ia, b.it AS ib
             |  FROM st a JOIN st b ON a.k = b.k AND a.mn < b.mx),
             |s2 AS (SELECT ia || '>' || ib AS pattern, 2 AS len,
             |    count(DISTINCT k) AS support FROM l2 GROUP BY ia, ib),
             |mid AS (SELECT a.k, a.it AS ia, p.it AS ib, min(p.p) AS pab
             |  FROM st a JOIN pos p ON p.k = a.k AND p.p > a.mn
             |  GROUP BY a.k, a.it, p.it),
             |l3 AS (SELECT m.k, m.ia, m.ib, c.it AS ic
             |  FROM mid m JOIN st c ON c.k = m.k AND m.pab < c.mx),
             |s3 AS (SELECT ia || '>' || ib || '>' || ic AS pattern, 3 AS len,
             |    count(DISTINCT k) AS support FROM l3 GROUP BY ia, ib, ic)
             |SELECT pattern, len, CAST(support AS BIGINT) AS support
             |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
             |  UNION ALL SELECT * FROM s3)
             |WHERE support >= 5 ORDER BY len, pattern""".stripMargin)),
  )
}
