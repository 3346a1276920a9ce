package graft

import org.apache.spark.sql.functions._

/** Analytic fixtures for the skyline (q157) and basket/CF (q158/q159)
  * operators. Fixture parquet carries only the columns each entry
  * references (Catalyst resolves against what exists).
  */
class BasketSkylineSpec extends SparkSpec {

  test("skyline keeps the non-dominated frontier, duplicates survive together") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("sky").toString
    // (key, price, size): frontier = (1.00,5) dup x2, (2.00,8); dominated:
    // (2.50,8) pricier same size, (1.00,3) same price smaller, (3.00,1)
    Seq((1L, 1.00, 5), (2L, 1.00, 5), (3L, 2.00, 8),
        (4L, 2.50, 8), (5L, 1.00, 3), (6L, 3.00, 1))
      .toDF("p_partkey", "p_retailprice", "p_size")
      .write.mode("overwrite").parquet(s"$work/part.parquet")
    val got = SparkEntry.queries("q157_skyline")(s, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((100L, 5L, 2L, 1L), (200L, 8L, 1L, 3L)), got.toSeq)
  }

  test("association rules compute exact support/confidence/lift") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("rules").toString
    Seq((1L, "A"), (2L, "B")).map { case (k, b) => (k, b) }
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$work/part.parquet")
    // 20 baskets: 10 with {A,B}, 5 with {A}, 5 with {B}
    val li = (1L to 10L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      (11L to 15L).map(o => (o, 1L)) ++ (16L to 20L).map(o => (o, 2L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    val got = SparkEntry.queries("q158_assoc_rules")(s, work)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5), r.getLong(6)))
    // supp_ab=10, supp_a=supp_b=15, N=20: conf=666, lift=10*20e6/225=888888
    assert(got.toSeq == Seq(("A", "B", 10L, 666L, 888888L),
      ("B", "A", 10L, 666L, 888888L)), got.toSeq)
  }

  test("item-item CF caps each user's contribution at the top-C items") {
    val s = spark
    import s.implicits._
    val work = java.nio.file.Files.createTempDirectory("cf").toString
    // one user buys items 1..25 once each -> cap keeps items 1..20
    // (count ties broken by partkey asc); a second user buys 1 and 21
    val li = (1L to 25L).map(i => (i, i)) :+ (26L, 1L) :+ (27L, 21L)
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    ((1L to 25L).map(o => (o, 100L)) ++ Seq((26L, 200L), (27L, 200L)))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    val got = SparkEntry.queries("q159_item_cf")(s, work)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    // user 100 pairs items 1..20 (190 pairs); user 200 pairs (1,21).
    // (1,21) has cooc=1, n_1=2, n_21=1 -> cosine = 1000/sqrt(2) = 707
    assert(got.length == 50)
    val p121 = got.find(p => p._1 == 1L && p._2 == 21L).get
    assert(p121 == (1L, 21L, 1L, 707L), p121)
    // no pair involves items 22..25 (cut by the cap for user 100)
    assert(!got.exists(p => p._2 > 21L))
  }
}
