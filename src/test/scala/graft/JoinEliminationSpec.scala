package graft

import org.apache.spark.sql.functions._
import graft.plans.FkRegistry

/** FK join elimination: sound eliminations fire (no Join in the plan,
  * values identical to the executed join — including NULL fact keys,
  * which the inner join drops and the rewrite must drop too), and
  * everything outside the declared scope is untouched.
  */
class JoinEliminationSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def fixture(tag: String) = {
    val sp = spark
    import sp.implicits._
    val work = java.nio.file.Files.createTempDirectory(s"graft-fk$tag").toString
    val factPath = s"$work/fact.parquet"
    val dimPath = s"$work/dim.parquet"
    // fact has a NULL key row — the null-semantics trap
    Seq((1L, Option(10L), 5L), (2L, Option(20L), 7L), (3L, Option(10L), 2L),
        (4L, None: Option[Long], 9L))
      .toDF("fid", "fk", "v").write.mode("overwrite").parquet(factPath)
    Seq((10L, "a"), (20L, "b"), (30L, "c")).toDF("pk", "name")
      .write.mode("overwrite").parquet(dimPath)
    (work, factPath, dimPath)
  }

  test("join removed when no dim column is read; NULL fk rows still drop") {
    val sp = spark
    val (work, factPath, dimPath) = fixture("1")
    FkRegistry.register(FkRegistry.FkConstraint("spec_fk1",
      s"$work/fact.parquet", "fk", s"$work/dim.parquet", "pk"))
    try {
      val q = sp.read.parquet(factPath)
        .join(sp.read.parquet(dimPath),
          col("fk") === col("pk"))
        .select(col("fid"), col("v"))
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"join survived:\n$plan")
      assert(!plan.contains("dim.parquet"), s"dim still scanned:\n$plan")
      // the NULL-fk row (fid 4) must be gone, exactly as the join drops it
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 5L), (2L, 7L), (3L, 2L)))
    } finally FkRegistry.unregister("spec_fk1")
  }

  test("pk reference rewrites to the fact's fk") {
    val sp = spark
    val (work, factPath, dimPath) = fixture("2")
    FkRegistry.register(FkRegistry.FkConstraint("spec_fk2",
      s"$work/fact.parquet", "fk", s"$work/dim.parquet", "pk"))
    try {
      val q = sp.read.parquet(factPath)
        .join(sp.read.parquet(dimPath), col("fk") === col("pk"))
        .select(col("fid"), col("pk"))
      val plan = planOf(q)
      assert(!plan.contains("Join"), s"join survived:\n$plan")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 20L), (3L, 10L)))
    } finally FkRegistry.unregister("spec_fk2")
  }

  test("untouched: FILTERED dimension — dropping it would resurrect " +
      "fact rows the join filters out") {
    val sp = spark
    val (work, factPath, dimPath) = fixture("4")
    FkRegistry.register(FkRegistry.FkConstraint("spec_fk4",
      s"$work/fact.parquet", "fk", s"$work/dim.parquet", "pk"))
    try {
      // dim filter keeps only pk=10 — the join now REDUCES the fact
      // (fid 2 joins pk 20 and must drop); eliminating it would be the
      // unsound rewrite this gate exists to block
      val q = sp.read.parquet(factPath)
        .join(sp.read.parquet(dimPath).filter(col("name") === "a"),
          col("fk") === col("pk"))
        .select(col("fid"), col("v"))
      assert(planOf(q).contains("Join"),
        s"filtered-dim join was unsoundly eliminated:\n${planOf(q)}")
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 5L), (3L, 2L)))
    } finally FkRegistry.unregister("spec_fk4")
  }

  test("untouched: dim column read, outer join, unregistered tables") {
    val sp = spark
    val (work, factPath, dimPath) = fixture("3")
    FkRegistry.register(FkRegistry.FkConstraint("spec_fk3",
      s"$work/fact.parquet", "fk", s"$work/dim.parquet", "pk"))
    try {
      val reads = sp.read.parquet(factPath)
        .join(sp.read.parquet(dimPath), col("fk") === col("pk"))
        .select(col("fid"), col("name"))
      assert(planOf(reads).contains("Join"))
      val outer = sp.read.parquet(factPath)
        .join(sp.read.parquet(dimPath), col("fk") === col("pk"), "left")
        .select(col("fid"), col("v"))
      assert(planOf(outer).contains("Join"))
    } finally FkRegistry.unregister("spec_fk3")
    // nothing registered at all
    val q = sp.read.parquet(factPath)
      .join(sp.read.parquet(dimPath), col("fk") === col("pk"))
      .select(col("fid"))
    assert(planOf(q).contains("Join"))
  }
}
