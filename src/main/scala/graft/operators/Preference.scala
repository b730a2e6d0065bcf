package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bradley–Terry preference ranking (q255) — the model behind pairwise
  * preference data (RLHF reward modelling, search interleaving, match
  * ranking): P(i beats j) = θ_i/(θ_i+θ_j), fit by Hunter's MM iteration
  * θ_i ← W_i / Σ_j n_ij/(θ_i+θ_j). Preferences here are deterministic doc
  * duels: doc 2k vs doc 2k+1, the longer text wins (ties to the even
  * doc), items = the docs' langs.
  *
  * Scale + determinism shape: the corpus-sized work is ONE equi-join
  * (consecutive-id pairing) plus a groupBy onto the |langs|² duel matrix;
  * the MM fixpoint runs on that collected domain (≤ items² cells — the
  * q184 nbInit precedent) with integer micro-unit state: each per-cell
  * reciprocal is floored at 10⁹ scale (one double division per cell, the
  * q195 rule), updates and the Σθ = k·10⁶ renormalization are integer
  * divisions, so every θ is an exact integer and the DuckDB oracle
  * replays the whole 8-iteration run CTE-for-CTE (the q184 unrolled-
  * training discipline).
  */
object Preference {

  private val Iters = 8

  /** Raw duel events (w, l): one row per decided doc duel. */
  def duelEvents(docs: DataFrame): DataFrame = {
    val a = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select(col("doc_id").as("ka"), col("lang").as("la"),
        col("n_chars").as("cha"))
    val b = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
      .select((col("doc_id") - 1).as("ka"), col("lang").as("lb"),
        col("n_chars").as("chb"))
    a.join(b, Seq("ka")).filter(col("la") =!= col("lb"))
      .select(
        when(col("cha") >= col("chb"), col("la")).otherwise(col("lb"))
          .as("w"),
        when(col("cha") >= col("chb"), col("lb")).otherwise(col("la"))
          .as("l"))
  }

  /** Duel-matrix state from raw duels: (w, l, c) — the MERGEABLE partial
    * (duel counts are pure sums), the B58 discipline's state shape. */
  def duelState(duels: DataFrame): DataFrame =
    duels.groupBy(col("w"), col("l")).agg(count(lit(1)).as("c"))

  /** Combine two duel-matrix states (prior ∪ a new batch's partials). */
  def mergeDuelState(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("w"), col("l")).agg(sum(col("c")).as("c"))

  /** Duel outcomes: (w, l, c) — lang w beat lang l in c doc duels. */
  def pairOutcomes(docs: DataFrame): DataFrame = duelState(duelEvents(docs))

  /** MM fixpoint over a collected duel matrix: item -> θ_micro after
    * `Iters` rounds (exact integer state, see object doc). */
  private[operators] def mmFit(cells: Map[(String, String), Long])
      : Map[String, Long] = {
    val items = cells.keysIterator.flatMap(k => Iterator(k._1, k._2))
      .toSeq.distinct.sorted
    val wins = items.map(i =>
      i -> cells.collect { case ((a, _), c) if a == i => c }.sum).toMap
    def n(i: String, j: String) =
      cells.getOrElse((i, j), 0L) + cells.getOrElse((j, i), 0L)
    var th = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to Iters) {
      val s = items.map { i =>
        i -> items.filter(_ != i).map { j =>
          val den = th(i) + th(j)
          val nij = n(i, j)
          if (nij == 0 || den == 0) 0L
          else math.floor(1000000000.0 * nij / den.toDouble).toLong
        }.sum
      }.toMap
      val u = items.map { i =>
        i -> (if (s(i) > 0) (BigInt(1000000000L) * wins(i) / s(i)).toLong
        else 0L)
      }.toMap
      val tot = u.values.map(BigInt(_)).sum
      th = items.map(i => i ->
        (if (tot > 0)
          (BigInt(u(i)) * items.size * 1000000L / tot).toLong
        else 0L)).toMap
    }
    th
  }

  /** Per item: (lang, wins, games, theta) ordered strongest-first,
    * re-solved from a (w, l, c) duel-matrix state — the readout shared by
    * the batch fixpoint and the streaming incremental maintenance. */
  def rankingFromState(state: DataFrame): DataFrame = {
    val spark = state.sparkSession
    import spark.implicits._
    val cells = state.collect() // ≤ |items|² rows
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val th = mmFit(cells)
    val items = th.keys.toSeq.sorted
    def n(i: String, j: String) =
      cells.getOrElse((i, j), 0L) + cells.getOrElse((j, i), 0L)
    val rows = items.map { i =>
      (i, cells.collect { case ((a, _), c) if a == i => c }.sum,
        items.filter(_ != i).map(j => n(i, j)).sum, th(i))
    }
    rows.toDF("lang", "wins", "games", "th")
      .select(col("lang"), col("wins"), col("games"), col("th"),
        QueryDef.dec4(col("th").cast("double") / lit(1e6)).as("theta"))
      .orderBy(col("th").desc, col("lang"))
      .drop("th")
  }

  /** Per item: (lang, wins, games, theta) ordered strongest-first. */
  def bradleyTerry(docs: DataFrame): DataFrame =
    rankingFromState(pairOutcomes(docs))

  private def q255(s: SparkSession, dir: String): DataFrame =
    bradleyTerry(Tables.documents(s, dir))

  private val q255Sql = {
    def step(k: Int): String = {
      val prev = s"t${k - 1}"
      s"""s$k AS MATERIALIZED (
         |  SELECT g.i,
         |    CAST(sum(CASE WHEN ti.th + tj.th > 0
         |      THEN CAST(floor(1000000000.0 * g.n
         |        / CAST(ti.th + tj.th AS DOUBLE)) AS HUGEINT)
         |      ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS s
         |  FROM games g
         |    JOIN $prev ti ON ti.i = g.i
         |    JOIN $prev tj ON tj.i = g.j
         |  GROUP BY g.i),
         |u$k AS MATERIALIZED (
         |  SELECT it.i,
         |    CASE WHEN COALESCE(s$k.s, 0) > 0
         |      THEN (CAST(1000000000 AS HUGEINT) * COALESCE(wn.wi, 0))
         |        // s$k.s
         |      ELSE CAST(0 AS HUGEINT) END AS th
         |  FROM items it LEFT JOIN s$k ON s$k.i = it.i
         |    LEFT JOIN wins wn ON wn.i = it.i),
         |t$k AS MATERIALIZED (
         |  SELECT i, CASE WHEN (SELECT sum(th) FROM u$k) > 0
         |    THEN (th * (SELECT count(*) FROM items) * 1000000)
         |      // (SELECT sum(th) FROM u$k)
         |    ELSE CAST(0 AS HUGEINT) END AS th
         |  FROM u$k),""".stripMargin
    }
    val steps = (1 to Iters).map(step).mkString("\n")
    s"""WITH a AS (
       |  SELECT doc_id AS ka, lang AS la, n_chars AS cha
       |  FROM documents WHERE doc_id % 2 = 0),
       |b AS (
       |  SELECT doc_id - 1 AS ka, lang AS lb, n_chars AS chb
       |  FROM documents WHERE doc_id % 2 = 1),
       |cells AS MATERIALIZED (
       |  SELECT CASE WHEN cha >= chb THEN la ELSE lb END AS w,
       |    CASE WHEN cha >= chb THEN lb ELSE la END AS l,
       |    count(*) AS c
       |  FROM a JOIN b USING (ka) WHERE la <> lb GROUP BY 1, 2),
       |items AS MATERIALIZED (
       |  SELECT DISTINCT i FROM (
       |    SELECT w AS i FROM cells UNION ALL SELECT l FROM cells)),
       |games AS MATERIALIZED (
       |  SELECT i, j, CAST(sum(c) AS BIGINT) AS n FROM (
       |    SELECT w AS i, l AS j, c FROM cells
       |    UNION ALL SELECT l AS i, w AS j, c FROM cells)
       |  GROUP BY i, j),
       |wins AS MATERIALIZED (
       |  SELECT w AS i, CAST(sum(c) AS HUGEINT) AS wi FROM cells
       |  GROUP BY w),
       |t0 AS MATERIALIZED (SELECT i, CAST(1000000 AS HUGEINT) AS th FROM items),
       |$steps
       |gtot AS (SELECT i, CAST(sum(n) AS BIGINT) AS games FROM games
       |  GROUP BY i)
       |SELECT it.i AS lang,
       |  CAST(COALESCE(wn.wi, 0) AS BIGINT) AS wins,
       |  COALESCE(gt.games, 0) AS games,
       |  CAST(CAST(CAST(t$Iters.th AS DOUBLE) / 1000000.0
       |    AS DECIMAL(38,4)) AS VARCHAR) AS theta
       |FROM items it
       |  LEFT JOIN wins wn ON wn.i = it.i
       |  LEFT JOIN gtot gt ON gt.i = it.i
       |  JOIN t$Iters ON t$Iters.i = it.i
       |ORDER BY t$Iters.th DESC, lang""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q255_bradley_terry", q255, Some(q255Sql)))
}
