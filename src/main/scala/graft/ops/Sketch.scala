package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.ColFns.{h32, sqlH32}

/** Sketch operators — the sublinear-state answers a 10^12-row corpus needs
  * when the exact form is a corpus-wide shuffle.
  *
  * [[hllDistinct]]: HyperLogLog distinct-count per language, implemented
  * AS AN ALGORITHM IN BOTH ENGINES rather than calling either engine's
  * built-in sketch (DuckDB's approx_count_distinct and Spark's
  * approx_count_distinct use different hash functions and register
  * layouts, so their outputs can never be oracle-compared). Everything up
  * to the final estimate is EXACT integer arithmetic on the shared
  * md5-derived h32:
  *   - bucket  = h div 2^(32-b)  (top b bits), w = h mod 2^(32-b)
  *   - rho     = leading-zero count of the (32-b)-bit w, plus one —
  *     computed by an explicit generated CASE threshold chain (no log(),
  *     no engine bit tricks)
  *   - register M_bucket = max(rho) — a (lang, bucket)-keyed partial agg,
  *     m rows per language TOTAL regardless of corpus size; unseen
  *     registers enter as M=0
  *   - S_int   = sum(2^(32-M)) as BIGINT == 2^32 * sum(2^-M) exactly
  * Only the last step leaves integers: est = alpha_m * m^2 * 2^32 / S_int
  * as one fixed-shape double expression (identical literals, identical
  * association in both engines -> bit-identical IEEE result), emitted
  * micro-floored. No small-range linear-counting branch: that needs ln()
  * (libm, NOT bit-portable across engines); instead m is chosen so the
  * raw regime holds at the test scale, and the audit columns (n_seen,
  * s_inv) let a consumer apply any correction downstream.
  *
  * Scale shape: one partial-agg shuffle to (lang, bucket) — at most
  * langs x m rows cross the wire per partition — then a tiny per-lang
  * fold. The exact-distinct alternative shuffles every distinct url once;
  * this never moves more than langs x m registers.
  */
object Sketch {

  /** rho thresholds: CASE w >= 2^(wbits-1) -> 1 ... w >= 1 -> wbits,
    * ELSE wbits+1 — generated identically for both engines.
    */
  private def rhoCol(w: Column, wbits: Int): Column = {
    val base = (1 to wbits).foldLeft(when(lit(false), lit(0))) {
      case (acc, k) =>
        // k-th branch: top (k-1) bits zero, bit (wbits-k) set -> rho = k
        acc.when(w >= (1L << (wbits - k)), lit(k))
    }
    base.otherwise(lit(wbits + 1))
  }

  private def sqlRho(w: String, wbits: Int): String =
    (1 to wbits)
      .map(k => s"WHEN $w >= ${1L << (wbits - k)} THEN $k")
      .mkString("CASE ", " ", s" ELSE ${wbits + 1} END")

  /** alpha_m constants (Flajolet et al.) for the supported register
    * counts; the 0.7213/(1+1.079/m) family above m=128.
    */
  private def alphaFor(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  def hllDistinct(pages: DataFrame, b: Int = 6): DataFrame = {
    require(b >= 4 && b <= 16, "b in [4,16]")
    val m = 1 << b
    val wbits = 32 - b
    val alpha = alphaFor(m)
    val regs = pages
      .select(col("lang"), h32(col("url")).as("h"))
      .select(col("lang"),
        expr(s"h div ${1L << wbits}L").as("bucket"),
        (col("h") % (1L << wbits)).as("w"))
      .select(col("lang"), col("bucket"), rhoCol(col("w"), wbits).as("rho"))
      .groupBy(col("lang"), col("bucket"))
      .agg(max(col("rho")).as("reg"))
    // per-lang fold: seen registers contribute 2^(32-reg); the (m - seen)
    // empty registers contribute 2^32 each (M = 0)
    regs
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_seen"),
        sum(expr("shiftleft(1L, 32 - reg)")).as("s_seen"))
      .select(col("lang"), col("n_seen"),
        (col("s_seen") + (lit(m.toLong) - col("n_seen")) * lit(1L << 32))
          .as("s_inv"))
      .select(col("lang"), col("n_seen"), col("s_inv"),
        floor(lit(alpha) * lit((m.toLong * m).toDouble) * lit(4294967296.0)
          / col("s_inv").cast("double") * lit(1000000.0))
          .cast("long").as("est_micro"))
      .orderBy(col("lang"))
  }

  /** DuckDB mirror — same thresholds, same fold, same literal constants
    * and association in the one double expression.
    */
  def hllDistinctSql(pagesGlob: String, b: Int = 6): String = {
    val m = 1 << b
    val wbits = 32 - b
    val alpha = alphaFor(m)
    s"""WITH h AS (SELECT lang, ${sqlH32("url")} AS h
       |  FROM read_parquet('$pagesGlob', hive_partitioning=1)),
       |x AS (SELECT lang, h // ${1L << wbits} AS bucket,
       |    h % ${1L << wbits} AS w FROM h),
       |r AS (SELECT lang, bucket, ${sqlRho("w", wbits)} AS rho FROM x),
       |reg AS (SELECT lang, bucket, max(rho) AS reg FROM r GROUP BY lang, bucket),
       |f AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_seen,
       |    CAST(sum(CAST(1 AS BIGINT) << (32 - reg)) AS BIGINT) AS s_seen
       |  FROM reg GROUP BY lang),
       |s AS (SELECT lang, n_seen,
       |    s_seen + ($m - n_seen) * ${1L << 32} AS s_inv FROM f)
       |SELECT lang, n_seen, CAST(s_inv AS BIGINT) AS s_inv,
       |  CAST(floor(CAST($alpha AS DOUBLE) * ${(m.toLong * m).toDouble} * 4294967296.0
       |    / CAST(s_inv AS DOUBLE) * 1000000.0) AS BIGINT) AS est_micro
       |FROM s ORDER BY lang""".stripMargin
  }
}
