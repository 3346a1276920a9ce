package graft

import org.apache.spark.sql.functions._
import graft.rel.Survival

/** Aalen–Johansen competing risks (q350). */
class CompetingRisksSpec extends SparkSpec {

  test("CIFs sum with survival to 1 when everyone exits observably") {
    val s = spark
    import s.implicits._
    // no censoring: 6 units, two causes, tied times
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (3L, 1L), (4L, 2L))
      .toDF("t", "c")
    val cif = Survival.competingRisks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val last1 = cif((3L, 1L)); val last2 = cif((4L, 2L))
    // with everyone exiting, CIF_1(max)+CIF_2(max) == 1 exactly (to r6)
    assert(math.abs(last1 + last2 - 1.0) < 1e-6, (last1, last2))
    // hand-check the first increments: S(0-)=1, n=6 at t=1 with d1=1,d2=1
    assert(math.abs(cif((1L, 1L)) - 1.0 / 6) < 1e-6)
    assert(math.abs(cif((1L, 2L)) - 1.0 / 6) < 1e-6)
  }

  test("competing events are not treated as censoring: CIF < 1-KM-per-cause") {
    val s = spark
    import s.implicits._
    // cause 2 removes half the cohort early; a 1-KM on cause 1 alone
    // (competitors censored) would overstate cause 1's incidence
    val df = ((1 to 10).map(i => (1L, 2L)) ++ (1 to 10).map(i => (5L, 1L)))
      .toDF("t", "c")
    val cif1 = Survival.competingRisks(df).collect()
      .filter(_.getLong(1) == 1L).map(_.getDouble(4)).max
    // true CIF_1 = S(4)*10/10 where S(4) = 1/2 → 0.5
    assert(math.abs(cif1 - 0.5) < 1e-6, cif1)
    // the naive 1-KM treating cause-2 exits as censored would give 1.0
    val naive = Survival.kaplanMeier(
      df.select(col("t"), when(col("c") === 1L, 1L).otherwise(0L).as("e")))
      .collect().map(_.getDouble(4)).min
    assert(math.abs((1.0 - naive) - 1.0) < 1e-6,
      s"fixture must make the naive path overstate: 1-KM = ${1.0 - naive}")
  }

  test("negative cause raises loudly; censoring reduces later denominators") {
    val s = spark
    import s.implicits._
    intercept[Exception] {
      Survival.competingRisks(Seq((1L, -1L)).toDF("t", "c")).collect()
    }
    // censored unit at t=1 leaves the risk set for t=2
    val df = Seq((1L, 0L), (2L, 1L), (2L, 1L)).toDF("t", "c")
    val rows = Survival.competingRisks(df).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(2) == 2L) // n_risk at t=2 excludes the censored
    assert(math.abs(rows.head.getDouble(4) - 1.0) < 1e-6)
  }
}
