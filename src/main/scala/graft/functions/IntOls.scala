package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** INTEGER-EXACT LOG-LOG OLS — the cross-engine-safe discipline for
  * fitted outputs.
  *
  * A `round(<ln/exp chain>, 6)` output is deterministic only modulo
  * the two engines' libm builds: each `ln` differs by an ulp, the OLS
  * fold accumulates the drift, and `exp` amplifies it — q410's r13
  * hash mismatch was exactly this (the driver's DuckDB produced a
  * different 6th decimal than the builder's). The house fix idiom
  * (q143's sqrt-milli snap, q421's IDF micro-round) is applied here to
  * every log-log fit:
  *
  *   1. snap each point's ln to an integer MICRO-unit ([[lnMicro]]) —
  *      one libm call per point, then a round with ~6 orders of
  *      magnitude of margin over ulp-level engine disagreement;
  *   2. fold the OLS moments in exact integers (order-free, so the
  *      order-pinned-window discipline for float folds is not even
  *      needed);
  *   3. emit slope/intercept as integer micro via an EXACT
  *      round-half-up rational division ([[rhu]]) — never a float
  *      division rounded at the end.
  *
  * Both engines then compute bit-identical integers end-to-end; the
  * only doubles left are the per-point `ln` calls, each individually
  * snapped. Used by q410 (Heaps' law), q366 (Zipf), q419 (degree
  * power-law).
  */
object IntOls {

  private val dec = "decimal(38,0)"

  /** ln(v) snapped to integer micro-units: round(ln(v)·1e6) as LONG.
    * One libm call; the snap tolerates ~5e-10 of absolute libm
    * disagreement per point (observed engine deltas are ~1e-15).
    */
  def lnMicro(v: Column): Column =
    round(log(v.cast("double")) * lit(1e6), 0).cast("long")

  /** Exact round-half-up of the rational p/q (q > 0), any sign of p:
    * floor((2p+q)/(2q)), with the floor computed via the non-negative
    * mod so the final division is exactly divisible — every engine's
    * integer-division truncation convention agrees on an exact
    * quotient. All arithmetic in decimal(38,0) (the DuckDB twin runs
    * the same formula in HUGEINT).
    */
  def rhu(p: Column, q: Column): Column = {
    val pp = p.cast(dec) * lit(2) + q.cast(dec)
    val qq = q.cast(dec) * lit(2)
    val m = ((pp % qq) + qq) % qq
    ((pp - m) / qq).cast("long")
  }

  /** The DuckDB twin of [[rhu]] as SQL text (operands must already be
    * HUGEINT-typed expressions; `q` > 0). Kept next to the Spark
    * kernel so the two replicas can never drift apart silently.
    */
  def rhuSql(p: String, q: String): String =
    s"CAST(((2*($p) + ($q)) - (((2*($p) + ($q)) % (2*($q)) + 2*($q)) % (2*($q)))) // (2*($q)) AS BIGINT)"
}
