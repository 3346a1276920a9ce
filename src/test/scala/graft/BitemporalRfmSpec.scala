package graft

import org.apache.spark.sql.functions._
import graft.rel.{Cohort, Scd, Tables}

class BitemporalRfmSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q227: belief at T = base sum + 500 per correction landed by T") {
    val s = spark
    val t = lit("1997-01-01").cast("timestamp")
    val v = lit("1996-12-01").cast("timestamp")
    val base = Tables.orders(s, sf).filter(col("o_orderdate") <= v)
    val baseSum = base
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))).collect()
      .head.getLong(0)
    val nCorrected = base
      .filter(col("o_orderkey") % 13 === 0 &&
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")) <= t)
      .count()
    val got = Scd.all("q227_bitemporal").fn(s, sf).collect()
    assert(got.map(_.getLong(1)).sum == base.count())
    assert(got.map(_.getLong(2)).sum == baseSum + 500L * nCorrected)
    assert(nCorrected > 0, "fixture must exercise the corrected branch")
  }

  test("q228: segments partition the customers; quartile marginals are equal") {
    val s = spark
    val rows = Cohort.all("q228_rfm_segments").fn(s, sf).collect()
    val nCust = Tables.orders(s, sf).select("o_custkey").distinct().count()
    assert(rows.map(_.getLong(3)).sum == nCust)
    // each axis's marginal is an equal 4-way split (ntile contract)
    for (axis <- 0 to 2) {
      val marg = rows.groupBy(_.getLong(axis)).view
        .mapValues(_.map(_.getLong(3)).sum)
      assert(marg.values.max - marg.values.min <= 1, s"axis $axis: $marg")
    }
  }
}
