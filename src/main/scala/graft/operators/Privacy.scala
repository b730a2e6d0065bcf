package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differentially-private aggregate release — the companion to q202's
  * k-anonymity AUDIT: where the audit reports whether a grouped release
  * re-identifies, this operator actually perturbs the statistics so the
  * release carries an (epsilon)-DP guarantee per published column.
  *
  * Mechanism: the geometric mechanism (the discrete analogue of Laplace;
  * Ghosh–Roughgarden–Sundararajan's universally-optimal mechanism for
  * counts). Noise Z has P(Z=z) proportional to alpha^|z| with
  * alpha = exp(-eps/sensitivity), truncated to [-B, B] with B chosen so
  * the truncated tail mass is below the 2^-24 resolution of the draw.
  *
  * Determinism discipline (the suite's no-RNG rule): the uniform draw is
  * the first 6 hex digits of md5(salt || group-key) — re-running,
  * repartitioning, or growing the cluster never changes a group's noise —
  * and the inverse-CDF is a TABLE of 2B+1 integer thresholds in [0, 2^24]
  * computed ONCE driver-side in Scala and embedded verbatim in both the
  * Spark plan and the generated DuckDB oracle. Sampling is then pure
  * integer comparisons (count thresholds <= u): no ln/exp runs inside
  * either engine, so the two engines cannot drift by a float ulp.
  *
  * Sums release on a grid: the clamped per-group sum is snapped to the
  * clamp grid (multiples of the contribution bound C) and C * Z is added,
  * Z drawn at sensitivity 1 — the standard quantized-grid construction
  * (one contribution moves the gridded sum by at most one step). The
  * deterministic snap (vs randomized rounding) is declared: it costs a
  * bounded C/2 bias, not a privacy-accounting change at the grid scale.
  *
  * Scale shape: one map-side-combined groupBy to the released domain, then
  * per-group scalar expressions — the noise table is O(B) literals, the
  * release never shuffles twice, and nothing depends on the corpus size.
  */
object Privacy {

  /** Integer inverse-CDF thresholds for the truncated geometric mechanism:
    * t(z) = round(CDF(z) * 2^24) for z = -bound .. bound. Sampling: with u
    * uniform on [0, 2^24), noise(u) = -bound + #{z : t(z) <= u}. */
  def geometricThresholds(eps: Double, bound: Int): Seq[Long] = {
    require(eps > 0 && bound > 0)
    val alpha = math.exp(-eps)
    val weights = (-bound to bound).map(z => math.pow(alpha, math.abs(z)))
    val total = weights.sum
    val cum = weights.scanLeft(0.0)(_ + _).tail
    cum.map(c => math.rint(c / total * (1L << 24)).toLong)
  }

  /** Truncation bound for eps so the dropped two-sided tail mass
    * alpha^B / (1 - alpha) stays below the draw resolution 2^-24. */
  def geometricBound(eps: Double): Int = {
    val alpha = math.exp(-eps)
    var b = 1
    while (math.pow(alpha, b) / (1 - alpha) > 1.0 / (1L << 24)) b += 1
    b
  }

  /** The 24-bit uniform draw for `key` under `salt` (Spark side). */
  private def draw(salt: String, key: Column): Column =
    conv(substring(md5(concat(lit(salt + ":"), key.cast("string"))), 1, 6),
      16, 10).cast("long")

  /** Deterministic geometric noise for `key`: integer in [-bound, bound]. */
  def geometricNoise(eps: Double, salt: String, key: Column): Column = {
    val bound = geometricBound(eps)
    val ts = geometricThresholds(eps, bound)
    val u = draw(salt, key)
    (size(filter(typedLit(ts), t => t <= u)) - lit(bound)).cast("long")
  }

  /** DuckDB twin of [[geometricNoise]], generated from the same table so
    * the engines cannot drift. `keyExpr` must be a VARCHAR expression. */
  def geometricNoiseSql(eps: Double, salt: String, keyExpr: String): String = {
    val bound = geometricBound(eps)
    val ts = geometricThresholds(eps, bound)
    val u = s"CAST(concat('0x', substr(md5(concat('$salt:', $keyExpr)), 1, 6)) AS BIGINT)"
    s"(len(list_filter(${ts.mkString("[", ", ", "]")}, t -> t <= $u)) - $bound)"
  }

  /** (epsilon)-DP release of per-group count and clamped sum.
    *
    * @param groupCol   released domain (must be a finite public domain —
    *                   releasing data-dependent group KEYS is a separate
    *                   stability problem, declared out of scope here)
    * @param valueCol   integer contribution column; clamped to [0, clamp]
    * @param epsCount   budget spent on the count column
    * @param epsSum     budget spent on the sum column (grid = clamp)
    * @param salt       release identifier; reusing a salt across releases
    *                   reuses noise and VOIDS composition — callers ledger
    *                   the total budget as epsCount + epsSum per salt
    */
  def dpRelease(df: DataFrame, groupCol: String, valueCol: Column,
      clamp: Long, epsCount: Double, epsSum: Double,
      salt: String): DataFrame = {
    val clamped = least(greatest(valueCol, lit(0L)), lit(clamp))
    val g = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(clamped).as("__s"))
    val shifted = (col("__s") + lit(clamp / 2)).cast("long")
    val gridded = shifted - pmod(shifted, lit(clamp))
    g.select(col(groupCol),
        (col("__n") + geometricNoise(epsCount, salt + ":n", col(groupCol)))
          .as("noisy_count"),
        (gridded + lit(clamp) *
          geometricNoise(epsSum, salt + ":s", col(groupCol)))
          .as("noisy_sum"),
        QueryDef.dec4(lit(epsCount + epsSum)).as("eps_spent"))
      .orderBy(col(groupCol))
  }

  // ==== q203: DP release of order counts + spend by priority ===============
  //
  // The governance pipeline end-to-end: q202 audits the raw grouped
  // release; q203 is what actually ships — per-priority order counts and
  // total spend (cents, clamped at $10,000 per order) under eps = 0.5
  // each, 1.0 total. The released domain (o_orderpriority) is the public
  // 5-value TPC-H enum, so no data-dependent key leakage. Bit-exact
  // across engines: the inverse-CDF table is driver-computed integers.

  private val EpsC = 0.5
  private val EpsS = 0.5
  private val Clamp = 1000000L // $10k in cents

  private def q203(s: SparkSession, dir: String): DataFrame =
    dpRelease(
      Tables.orders(s, dir)
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
      "o_orderpriority", col("cents"), Clamp, EpsC, EpsS, "q203")

  private val q203Sql = {
    val nz = Privacy.geometricNoiseSql(EpsC, "q203:n", "o_orderpriority")
    val sz = Privacy.geometricNoiseSql(EpsS, "q203:s", "o_orderpriority")
    s"""WITH g AS (
       |  SELECT o_orderpriority, count(*) AS n,
       |    CAST(sum(least(greatest(CAST(round(o_totalprice * 100) AS BIGINT),
       |      0), $Clamp)) AS BIGINT) AS s
       |  FROM orders GROUP BY 1)
       |SELECT o_orderpriority,
       |  n + $nz AS noisy_count,
       |  (s + ${Clamp / 2}) - (s + ${Clamp / 2}) % $Clamp
       |    + $Clamp * $sz AS noisy_sum,
       |  CAST(CAST(${EpsC + EpsS} AS DECIMAL(38,4)) AS VARCHAR) AS eps_spent
       |FROM g ORDER BY o_orderpriority""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q203_dp_release", q203, Some(q203Sql)))
}
