package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.rel.BloomJoin

/** The Bloom runtime semi-join: results must be EXACTLY the plain join
  * (false positives eliminated by the join itself), the probe must run
  * below the probe side's shuffle, stay codegen'd, and actually drop
  * non-matching rows; string keys probe the same bytes the build hashed.
  */
class BloomJoinSpec extends SparkSpec {

  test("bloomEquiJoin equals the plain join exactly (long keys)") {
    val s = spark
    import s.implicits._
    val r = new scala.util.Random(3)
    // fact keys 0..9999, build side holds a sparse 2% subset
    val fact = Seq.tabulate(20000)(i => (r.nextInt(10000).toLong, i)).toDF("k", "payload")
    val build = Seq.tabulate(200)(i => ((i * 50).toLong, s"dim$i")).toDF("k", "name")
    val got = BloomJoin.bloomEquiJoin(s, fact, build, "k", expectedNdv = 200)
      .select("k", "payload", "name").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).sorted.toSeq
    val want = fact.join(build, "k")
      .select("k", "payload", "name").collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getString(2))).sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("string keys: probe hashes the same bytes the build side put") {
    val s = spark
    import s.implicits._
    val fact = Seq.tabulate(5000)(i => (s"key${i % 500}", i)).toDF("k", "payload")
    val build = Seq.tabulate(20)(i => (s"key${i * 25}", i)).toDF("k", "dim")
    val got = BloomJoin.bloomEquiJoin(s, fact, build, "k", expectedNdv = 20)
      .select("k", "payload").collect().map(x => (x.getString(0), x.getInt(1))).sorted.toSeq
    val want = fact.join(build, "k")
      .select("k", "payload").collect().map(x => (x.getString(0), x.getInt(1))).sorted.toSeq
    assert(got == want && want.nonEmpty)
  }

  test("semi-filter drops non-matching rows and keeps every match") {
    val s = spark
    import s.implicits._
    val fact = Seq.tabulate(50000)(i => (i.toLong, i)).toDF("k", "payload")
    val build = Seq.tabulate(100)(i => (i.toLong * 7, i)).toDF("k", "dim")
    val kept = BloomJoin.bloomSemiFilter(s, fact, build, "k",
      expectedNdv = 100, fpp = 0.01).count()
    // all 100 matches survive; false positives ≈ fpp of the other 49900
    assert(kept >= 100, s"dropped real matches: kept $kept")
    assert(kept <= 100 + 2500, s"bloom not selective: kept $kept of 50000")
  }

  test("the probe runs below the probe-side exchange, inside codegen") {
    val s = spark
    import s.implicits._
    // a real scan (Range), not a LocalRelation — Catalyst constant-folds
    // deterministic filters over LocalRelation at optimization time
    val fact = s.range(1000).select(col("id").as("k"), (col("id") * 2).as("payload"))
    val build = Seq.tabulate(10)(i => (i.toLong * 3, i)).toDF("k", "dim")
    // force a shuffle join so there IS a probe-side exchange; AQE off so
    // the tree is final (collect() cannot see through AdaptiveSparkPlan)
    val plan = withSQLConf(s)("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      BloomJoin.bloomEquiJoin(s, fact, build, "k", expectedNdv = 10)
        .queryExecution.executedPlan
    }
    val exchangesWithProbe = plan.collect {
      case e: ShuffleExchangeExec if e.collect { case f: FilterExec
        if f.condition.toString.contains("bloom_might_contain") => f }.nonEmpty => e
    }
    assert(exchangesWithProbe.nonEmpty,
      s"bloom probe not below an exchange:\n$plan")
    // whole-stage-codegen'd: the Filter line carries the *(n) marker
    val codegenFilter = plan.toString.linesIterator.exists(l =>
      l.contains("bloom_might_contain") && l.contains("Filter") && l.contains("*("))
    assert(codegenFilter, s"bloom probe filter not codegen'd:\n$plan")
  }

  private def withSQLConf(s: org.apache.spark.sql.SparkSession)(
      kv: (String, String)*)(f: => org.apache.spark.sql.execution.SparkPlan)
      : org.apache.spark.sql.execution.SparkPlan = {
    val old = kv.map { case (k, _) => k -> s.conf.getOption(k) }
    kv.foreach { case (k, v) => s.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
