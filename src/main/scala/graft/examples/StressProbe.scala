package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10× STRESS PROBE for the bench tier's worst queries — the cheapest
  * way to catch the next scale-killer before a plan audit has to: build
  * a deterministic 10× replica tier from sf0.1 (each copy's entity keys
  * shifted by a disjoint offset — same density, 10× volume, no
  * cross-copy edges) and run the historically most expensive entries
  * against it, asserting PLAN-SHAPE INVARIANCE first (the shuffle/
  * exchange count at 10× must equal the count at 1× — a plan that
  * changes shape with data size is the thing this probe exists to
  * catch) and then recording wall time.
  *
  * Key offsets stay below 2³¹ (10⁷ per copy) so the triangle
  * orientation packing's 31-bit id requirement keeps holding at 10×.
  *
  * Run: sbt "runMain graft.examples.StressProbe [srcDir] [factor]"
  * Writes the replica tier to /tmp/graft_stress_sf<factor>x (reused if
  * present), prints one STRESSPROBE json line.
  */
object StressProbe {
  private val Probes = Seq("q118_triangles", "q116_pagerank",
    "q182_prefix_jaccard", "q187_funnel_gap_stats", "q34_ngram_jaccard",
    "q237_cdc_apply", "q239_connected_components",
    // r10 verdict item 5: the top bench wall's brand-new oriented-
    // intersection plan must hold shape at 10×
    "q188_embeddedness",
    // r11 continuation tier: DSIR exact scoring (two gram-keyed model
    // aggs + the scoring joins — the Zipf-bounded-model claim under
    // load) and the full RM3 loop (feedback broadcasts must STAY
    // broadcasts as the corpus grows)
    "q281_dsir_weights", "q286_rm3_rerank",
    // r11 continuation II: the third lexical ranker (query-term postings
    // prune + collection-model broadcast must hold shape), and the
    // experiment tier (CUPED's moment aggs; the bootstrap's R-way
    // map-side expansion must NOT become a data-sized shuffle)
    "q288_ql_dirichlet", "q290_cuped", "q291_bootstrap_ci",
    // r11 continuation IV: the neighborhood-function ladder — the
    // exact rung's pair state grows with Σ comp² (watch its wall; its
    // plan must still hold shape) while the HyperANF rung's register
    // state stays n·m rows (the 100 TB contrast, measured live); the
    // Markov absorption (journey window + k+1 tiny chains) and the BT
    // duel extraction (one pair join + count agg) must stay flat
    "q324_neighborhood_exact", "q325_hyperanf_hll",
    "q321_markov_attribution", "q323_bradley_terry",
    // r12 verdict item 7: the k-truss peel loop — the second iterative
    // class (monotone shrink over cached triangles) the gate defends
    "q331_ktruss",
    // r12: the two community detectors — fixed synchronous rounds over
    // the 10× trade graph (LPA label votes + the modularity report;
    // Louvain gain argmax under the coloring schedule)
    "q344_lpa_modularity", "q352_louvain_move",
    // r12 continuation: sampled-source Brandes — per-round traffic is
    // sources × frontier-degree; disjoint replicas give 10× sources
    // each confined to its copy, so state scales linearly and the
    // forward/backward round structure must hold shape — and the
    // HyperBall harmonic rung (per-node register state, the q325
    // class, plus the per-t est retention + diff join)
    "q375_betweenness", "q379_harmonic_hyperball",
    // r13: two-level Louvain — everything past the level-1 rounds is
    // QUOTIENT-sized (the (cu,cv) rollup + weighted re-move on the
    // community graph); at 10× the replica tier has 10× communities
    // but the per-copy quotients stay copy-local, so the plan shape
    // (and the level-2 wall share) must hold
    "q408_louvain_two_level",
    // r14: the composed training-data plan — one corpus pass into a
    // checkpointed narrow table, then source-bounded stages; at 10×
    // tokens (same 20-source domain) the exchange count must hold and
    // the tail stages' wall share must stay negligible
    "q430_training_data_plan",
    // r15: the interleaved curriculum — doc-level work is one
    // per-source hash-order pass; the schedule side is SHARD-bounded
    // and must stay a broadcast join at 10× shards (a flip to SMJ
    // here is exactly the q430 regression class the probe caught)
    "q442_interleaved_curriculum")

  // operator-level probes for paths whose driver entries can't run off
  // the pinned fixture (q274 is fixture-guarded; q270 is the
  // deliberately-exact oracle anchor whose all-pairs edge stage is the
  // thing the IVF path exists to avoid): the 100 TB semantic-clustering
  // composition itself, probed directly.
  private val OpProbes: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] = Seq(
    "semantic_clusters_ivf" -> ((s, d) => {
      val e = s.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      // the deployment sizing rule under test: cells ∝ n keeps the
      // per-cell candidate block CONSTANT as the corpus grows (a fixed
      // cell count makes the per-cell self-join quadratic again —
      // measured 365 s at 10× with cells=16 before this)
      val cells = math.max(16, (e.count() / 125L).toInt)
      graft.llm.Mining.semanticClustersIvf(s, e, k = 2, cells = cells,
        multiAssign = 4)
    }),
    // r12 item 7: the incremental-fold class at its 100 TB form — the
    // q277 fold with the IVF attach rung (the exact attach is the
    // documented all-pairs oracle anchor; probing IT at 10× would
    // measure the shape the operator exists to avoid). Base/batch
    // split by id mod 10 so BOTH sides scale with the tier; cells ∝
    // corpus (the q274 sizing rule).
    "clusters_delta_ivf" -> ((s, d) => {
      val e = s.read.parquet(s"$d/embeddings.parquet")
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val base = e.filter(col("id") % 10 =!= 0)
      val batch = e.filter(col("id") % 10 === 0)
      val cells = math.max(16, (e.count() / 125L).toInt)
      val boot = graft.llm.Mining.semanticClustersIvf(s, base, k = 2,
        cells = cells, multiAssign = 4)
      graft.llm.Mining.clustersDeltaIvf(s, boot.select("node", "comp_id"),
        base, batch, tauMilli = 350, cells = cells, multiAssign = 4)
    }),
    // r12 item 7: the persisted trigram probe — the q343 serving path.
    // The index builds ONCE per tier dir (cached); the probed plan's
    // shape must not depend on corpus size (fixed bucket count, the
    // pattern's gram set bounds the read).
    "trigram_probe_served" -> ((s, d) => {
      val dir = trigramDirs.getOrElseUpdate(d, {
        val work = java.nio.file.Files
          .createTempDirectory("graft-stress-trgm").toString
        graft.llm.Trigram.saveTrigram(s,
          s.read.parquet(s"$d/documents.parquet")
            .select(col("doc_id").as("id"), col("text")), work)
        work
      })
      graft.llm.Trigram.probeTrigram(s, dir, "fast merge")
    }),
    // r12 item 8: the DSIR hashed rung — the form the 100 TB story
    // rests on. Beyond shape invariance, the loop below asserts ZERO
    // gram-keyed exchanges on this probe: the m-bucket model collapses
    // map-side (b-keyed, m-bounded) and broadcasts, so no shuffle may
    // ever be partitioned on the raw gram column.
    "dsir_hashed_topk" -> ((s, d) => {
      val docs = s.read.parquet(s"$d/documents.parquet")
      graft.llm.Dsir.dsirTopKHashed(s,
        docs.filter(col("lang") === "en"), docs, k = 25, buckets = 16384)
    }))

  private val trigramDirs =
    scala.collection.concurrent.TrieMap[String, String]()

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val out = s"/tmp/graft_stress_sf${factor}x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val off = 10_000_000L // per-copy key shift; factor·off stays < 2³¹
    // (table, key columns to shift) — only the tables the probes read
    val plans: Seq[(String, Seq[String])] = Seq(
      ("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      ("orders", Seq("o_orderkey", "o_custkey")),
      ("events", Seq("event_id", "user_id")),
      ("documents", Seq("doc_id")),
      ("embeddings", Seq("vec_id")),
      // q323's duel extraction: suppkeys shift (disjoint per copy),
      // nationkeys deliberately DON'T — every copy maps onto the same
      // 25 nations, so the item set stays fixed while duel volume
      // grows 10× (the realistic leaderboard shape). nation itself is
      // a dimension: copied once, never replicated (an empty key list
      // below means verbatim single copy).
      ("supplier", Seq("s_suppkey")),
      ("nation", Seq.empty))
    // per-table build check (not one global marker): a replica tier
    // built by an older probe version may lack newly-probed tables
    plans.foreach { case (t, keys) =>
      if (!new java.io.File(s"$out/$t.parquet/_SUCCESS").exists()) {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val replicated =
          if (keys.isEmpty) base // dimension table: one verbatim copy
          else (0 until factor).map { i =>
            keys.foldLeft(base) { (df, k) =>
              df.withColumn(k, col(k) + lit(i * off))
            }
          }.reduce(_ unionAll _)
        replicated.write.mode("overwrite").parquet(s"$out/$t.parquet")
        println(s"[stress] built $t x${if (keys.isEmpty) 1 else factor}")
      }
    }

    // typed walk, not a rendered-string regex: Exchange nodes on ':'-
    // prefixed join branches would escape a line-anchored pattern and
    // let a shape change inside a join's left branch slip the gate.
    // AdaptiveSparkPlanExec is a leaf wrapper, so descend explicitly.
    def countEx(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => countEx(a.executedPlan)
        case _ => 0
      }
      self + inner + p.children.map(countEx).sum
    }
    def exchanges(df: DataFrame): Int = countEx(df.queryExecution.executedPlan)

    // gram-keyed exchange detector for the DSIR hashed probe: an
    // exchange hash-partitioned on the raw gram column `g` would mean
    // the vocabulary is being shuffled — the exact thing the m-bucket
    // model exists to avoid (b-keyed, m-bounded exchanges are fine)
    def gramKeyedEx(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
      val self = p match {
        case e: ShuffleExchangeLike => e.outputPartitioning match {
          case h: HashPartitioning
            if h.expressions.exists(_.references.exists(_.name == "g")) => 1
          case _ => 0
        }
        case _ => 0
      }
      val inner = p match {
        case a: AdaptiveSparkPlanExec => gramKeyedEx(a.executedPlan)
        case _ => 0
      }
      self + inner + p.children.map(gramKeyedEx).sum
    }

    val all = graft.SparkEntry.allQ
    // SPARK_GRAFT_PROBE_ONLY=name1,name2 restricts the probe list —
    // iterating on one new probe without the full 20-probe sweep
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_PROBE_ONLY").map(_.split(',').toSet)
    val targets: Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
      (Probes.map(n => n -> all(n).fn) ++ OpProbes)
        .filter { case (n, _) => only.forall(_.contains(n)) }
    val results = targets.map { case (name, fn) =>
      // plan-shape invariance gate BEFORE timing: same exchange count
      // at 1× and at factor× (nothing collapses to a new shuffle shape
      // or single-task stage as data grows)
      val ex1 = exchanges(fn(spark, src))
      val exN = exchanges(fn(spark, out))
      require(ex1 == exN,
        s"$name plan shape changed at ${factor}x: $ex1 exchanges -> $exN")
      if (name == "dsir_hashed_topk") {
        val g = gramKeyedEx(fn(spark, out).queryExecution.executedPlan)
        require(g == 0,
          s"dsir_hashed_topk: $g gram-keyed exchange(s) — the vocabulary " +
            "is shuffling; the m-bucket model must keep scoring map-side")
      }
      val t0 = System.nanoTime()
      fn(spark, out).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $name: ${factor}x wall $wall%.1f s ($exN exchanges, invariant)")
      (name, wall, exN)
    }
    val json = results.map { case (n, w, e) =>
      f""""$n": {"sec": $w%.1f, "exchanges": $e}"""
    }.mkString(s"""{"factor": $factor, """, ", ", "}")
    println(s"STRESSPROBE $json")
    spark.stop()
  }
}
