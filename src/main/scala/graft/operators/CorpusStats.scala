package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level distribution statistics (round 7, B85–B87): character
  * entropy (the cheap gibberish/boilerplate filter), the source×source
  * n-gram overlap matrix (corpus-mixture audit: which sources are near-
  * copies of each other), and out-of-vocabulary rate against the corpus
  * head vocabulary (domain-shift signal per document).
  */
object CorpusStats {

  // ==== q135: per-document character entropy ================================
  //
  // Shannon entropy over a FIXED 28-bin charset (a–z, space, other) — the
  // standard cheap quality gate: near-0 entropy = one repeated character
  // (boilerplate padding), abnormally high = random bytes. Fixed bins
  // rather than per-document distinct characters keep the operator one
  // codegen'd map-side projection — 27 replace/length passes per row, no
  // explode, no shuffle, no per-doc hash map. Cross-engine exactness:
  // H = ln(n) − (Σ cᵢ·ln cᵢ)/n over INTEGER counts, terms added in fixed
  // bin order — both engines ln() the same integer-valued doubles and add
  // in the same sequence.

  private val EntropyBins: Seq[String] = ('a' to 'z').map(_.toString) :+ " "

  /** (n_chars, entropy_nats) columns for `text`. */
  def charEntropy(text: Column): (Column, Column) = {
    val n = length(text)
    val counts = EntropyBins.map(ch => n - length(replace(text, lit(ch), lit(""))))
    val other = n - counts.reduceLeft(_ + _)
    val terms = (counts :+ other).map { c =>
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))
    }
    val h = log(n.cast("double")) - terms.reduceLeft(_ + _) / n.cast("double")
    (n, h)
  }

  private def q135(s: SparkSession, dir: String): DataFrame = {
    val (n, h) = charEntropy(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"), n.as("n_chars_measured"),
        QueryDef.dec4(h).as("entropy_nats"))
      .orderBy(col("doc_id"))
  }

  private val q135Sql = {
    val cnt = (i: Int, ch: String) =>
      s"length(text) - length(replace(text, '$ch', '')) AS c$i"
    val cntCols = EntropyBins.zipWithIndex
      .map { case (ch, i) => cnt(i + 1, ch) }.mkString(",\n    ")
    val sumC = (1 to EntropyBins.size).map(i => s"c$i").mkString(" + ")
    val term = (i: Int) =>
      s"CASE WHEN c$i > 0 THEN CAST(c$i AS DOUBLE) * ln(CAST(c$i AS DOUBLE)) " +
        "ELSE CAST(0 AS DOUBLE) END"
    val terms = (1 to EntropyBins.size + 1).map(term).mkString("\n      + ")
    s"""WITH c AS (
       |  SELECT doc_id, length(text) AS n,
       |    $cntCols
       |  FROM documents),
       |c2 AS (SELECT *, n - ($sumC) AS c${EntropyBins.size + 1} FROM c)
       |SELECT doc_id, n AS n_chars_measured,
       |  CAST(CAST(ln(CAST(n AS DOUBLE)) - ($terms) / CAST(n AS DOUBLE)
       |    AS DECIMAL(38,4)) AS VARCHAR) AS entropy_nats
       |FROM c2 ORDER BY doc_id""".stripMargin
  }

  // ==== q136: source×source n-gram overlap matrix ===========================
  //
  // Pairwise Jaccard between per-source distinct 3-gram sets — the corpus-
  // mixture audit (two "different" crawls that are 80% the same inflate
  // dedup debt and skew mixture weights). Scale shape: the pair space is
  // generated from a gram-keyed inverted index, so fan-out per gram is
  // bounded by |sources|² (a DOMAIN constant, thousands at most) — never by
  // corpus volume; the reused PairCombos kernel emits each gram's source
  // pairs in one tight loop. No source×source×grams cross join anywhere.

  /** Pairwise (ga < gb) n-gram Jaccard between groups. `docs`: (gid, text). */
  def groupOverlap(docs: DataFrame, shingleN: Int): DataFrame = {
    val grams = docs
      .select(col("gid"), explode(Dedup.shingles(col("text"), shingleN)).as("g"))
      .distinct()
    val sizes = grams.groupBy(col("gid")).agg(count(lit(1)).as("sz"))
    val buckets = grams.groupBy(col("g")).agg(
      sort_array(collect_list(struct(col("gid").as("doc_id"), lit(0L).as("p"))))
        .as("members"))
    val inter = buckets
      .select(explode(graft.functions.PairCombos.of(col("members"))).as("pr"))
      .groupBy(col("pr.doc_a").as("ga"), col("pr.doc_b").as("gb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("gid").as("ga"), col("sz").as("sza"))), Seq("ga"))
      .join(broadcast(sizes.select(col("gid").as("gb"), col("sz").as("szb"))), Seq("gb"))
      .select(col("ga"), col("gb"), col("inter"),
        (col("sza") + col("szb") - col("inter")).as("uni"),
        QueryDef.dec4(col("inter").cast("double") /
          (col("sza") + col("szb") - col("inter")).cast("double")).as("jaccard"))
  }

  private def q136(s: SparkSession, dir: String): DataFrame =
    groupOverlap(
      Tables.documents(s, dir)
        .select(substring(col("source"), 4, 10).cast("long").as("gid"), col("text")),
      shingleN = 3)
      .orderBy(col("ga"), col("gb"))

  private val q136Sql =
    """WITH toks AS (
      |  SELECT CAST(substr(source, 4) AS BIGINT) AS gid,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT gid, array_to_string(t[i:i+2], ' ') AS s
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3
      |  UNION
      |  SELECT gid, array_to_string(t, ' ') FROM toks
      |  WHERE len(t) BETWEEN 1 AND 2),
      |sz AS (SELECT gid, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT a.gid AS ga, b.gid AS gb, count(*) AS inter
      |  FROM sh a JOIN sh b ON a.s = b.s AND a.gid < b.gid GROUP BY 1, 2)
      |SELECT ga, gb, inter, sa.sz + sb.sz - inter AS uni,
      |  CAST(CAST(CAST(inter AS DOUBLE) /
      |    CAST(sa.sz + sb.sz - inter AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR)
      |    AS jaccard
      |FROM inter JOIN sz sa ON sa.gid = ga JOIN sz sb ON sb.gid = gb
      |ORDER BY ga, gb""".stripMargin

  // ==== q137: out-of-vocabulary rate against the corpus head ================
  //
  // Per-document fraction of token OCCURRENCES outside the top-V corpus
  // vocabulary — the cheap domain-shift / tokenizer-fit signal. The vocab
  // is V rows (TakeOrdered over the token counts), collected and pushed
  // back as a literal array, so scoring is pure map-side: one array filter
  // per document, no second shuffle, no join. The V-row collect is the
  // bounded-scalar class (like the IVF probe-cell lists), not a data
  // collect.

  /** Adds n_tokens / n_oov / oov_rate against the top-`vocabSize` tokens
    * (ties broken by token text ascending). */
  def oovRate(docs: DataFrame, vocabSize: Int): DataFrame = {
    val vocab = docs
      .select(explode(Tok.ws(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("t"))
      .limit(vocabSize)
      .select(col("t")).collect().map(_.getString(0))
    val toks = Tok.ws(col("text"))
    val inVocab = typedLit(vocab.toSeq)
    docs.withColumn("n_tokens", size(toks))
      .withColumn("n_oov",
        size(filter(toks, t => not(array_contains(inVocab, t)))))
      .withColumn("oov_rate", QueryDef.dec4(
        col("n_oov").cast("double") / col("n_tokens").cast("double")))
  }

  private def q137(s: SparkSession, dir: String): DataFrame =
    oovRate(Tables.documents(s, dir).select(col("doc_id"), col("text")), 15)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_rate"))
      .orderBy(col("doc_id"))

  private val q137Sql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents),
      |vocab AS (
      |  SELECT t FROM tok GROUP BY t ORDER BY count(*) DESC, t LIMIT 15),
      |st AS (
      |  SELECT doc_id, count(*) AS n_tokens,
      |    CAST(sum(CASE WHEN t IN (SELECT t FROM vocab) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
      |  FROM tok GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_oov,
      |  CAST(CAST(CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS oov_rate
      |FROM st ORDER BY doc_id""".stripMargin

  // ==== q147: n-gram novelty — fraction of a doc's grams unseen elsewhere ===
  //
  // The memorization/uniqueness signal: a doc whose 3-grams all appear in
  // other docs is boilerplate; a doc of df=1 grams is novel content. One
  // (doc, gram)-distinct projection, one gram-keyed document-frequency
  // aggregate, one join back — the inherent tf-idf shuffle shape (q54).
  // Skew is benign: a gram with huge df joins its own rows against ONE
  // df row. Novelty = df-1 gram count / distinct gram count — integers
  // divided.

  /** Adds per-doc distinct-gram counts and the df=1 novelty rate. */
  def ngramNovelty(docs: DataFrame, shingleN: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), shingleN)).as("g"))
      .distinct()
    val dfTab = grams.groupBy(col("g")).agg(count(lit(1)).as("df"))
    grams.join(dfTab, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_grams"), col("n_unique"),
        QueryDef.dec4(col("n_unique").cast("double") /
          col("n_grams").cast("double")).as("novelty"))
  }

  private def q147(s: SparkSession, dir: String): DataFrame =
    ngramNovelty(Tables.documents(s, dir).select(col("doc_id"), col("text")), 3)
      .orderBy(col("doc_id"))

  private val q147Sql =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3
      |  UNION
      |  SELECT doc_id, array_to_string(t, ' ') FROM toks
      |  WHERE len(t) BETWEEN 1 AND 2),
      |dfs AS (SELECT g, count(*) AS df FROM sh GROUP BY 1)
      |SELECT doc_id, count(*) AS n_grams,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(CAST(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(count(*) AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS novelty
      |FROM sh JOIN dfs USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ==== q154: token burstiness (variance-to-mean ratio) =====================
  //
  // Burstiness separates topical words (appear many times in few docs —
  // VMR ≫ 1) from function words (spread evenly — VMR ≈ 1): the signal
  // behind stopword discovery and keyword extraction. One explode + one
  // token-keyed map-side-combined aggregation over integer per-doc counts;
  // VMR = (N·Σc² − (Σc)²) / (Σc·N) uses the q144 integer-moment form —
  // one division of exact BIGINTs. N (corpus doc count) is one broadcast
  // scalar: docs where the token does NOT appear contribute zeros to the
  // variance without ever materializing (the sparse-moment trick).

  /** Per-token (df, total occurrences, VMR) over the corpus; `minDf`
    * prunes the long tail. */
  def tokenBurstiness(docs: DataFrame, minDf: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nDocs = docs.count()
    val perDoc = docs
      .select(col("doc_id"), explode(Tok.ws(col("text"))).as("t"))
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
    perDoc.groupBy(col("t"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("total"),
        sum(col("c") * col("c")).as("sq"))
      .filter(col("df") >= minDf)
      .select(col("t"), col("df"), col("total"),
        QueryDef.dec4((lit(nDocs) * col("sq") - col("total") * col("total"))
          .cast("double") /
          (col("total") * lit(nDocs)).cast("double")).as("vmr"))
  }

  private def q154(s: SparkSession, dir: String): DataFrame =
    tokenBurstiness(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      minDf = 5)
      .orderBy(col("t"))

  private val q154Sql =
    """WITH n AS (SELECT count(*) AS nd FROM documents),
      |per_doc AS (
      |  SELECT doc_id, t, count(*) AS c FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |    FROM documents)
      |  GROUP BY 1, 2),
      |m AS (
      |  SELECT t, count(*) AS df, CAST(sum(c) AS BIGINT) AS total,
      |    CAST(sum(c * c) AS BIGINT) AS sq
      |  FROM per_doc GROUP BY 1)
      |SELECT t, df, total,
      |  CAST(CAST(CAST(nd * sq - total * total AS DOUBLE) /
      |    CAST(total * nd AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS vmr
      |FROM m CROSS JOIN n WHERE df >= 5 ORDER BY t""".stripMargin

  // ==== q155: population stability index (PSI) between corpus slices ========
  //
  // THE production drift metric (scorecard monitoring): bin the baseline
  // slice into equal-depth deciles, then PSI = Σ (p_b − p_a)·ln(p_b/p_a).
  // Complements q131's KS (KS = worst single point; PSI = total
  // distribution movement). Bins come from the distributed exact-quantile
  // boundaries of slice A (the q143 machinery) broadcast to one map-side
  // pass; per-bin proportions divide integers, and the ln/sum runs over
  // exactly `buckets` rows in fixed bin order — cross-engine stable.

  /** One-row PSI of `colName` between sideA (baseline) and the rest. */
  def psi(df: DataFrame, colName: String, sideA: Column, buckets: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val bounds = Profiling.exactQuantiles(df.filter(sideA), colName, ps)
    val rounded = Seq(Tuple1(bounds.map(b => math.rint(b * 10000) / 10000)))
      .toDF("bs")
    val binned = df
      .select(col(colName).cast("double").as("v"),
        when(sideA, 1L).otherwise(0L).as("a"))
      .crossJoin(broadcast(rounded))
      .select(aggregate(col("bs"), lit(0),
        (acc, b) => acc + when(round(col("v"), 4) > b, 1).otherwise(0))
        .as("bin"), col("a"))
      .groupBy(col("bin"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val tot = broadcast(binned.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")))
    // Laplace +1 smoothing: an empty bin makes raw PSI infinite (ln 0); the
    // standard fix adds one pseudo-count per bin on BOTH slices, keeping
    // identical slices at exactly 0 and disjoint slices large but finite
    val pa = (col("ca") + 1).cast("double") /
      (col("na") + lit(buckets)).cast("double")
    val pb = (col("cb") + 1).cast("double") /
      (col("nb") + lit(buckets)).cast("double")
    binned.crossJoin(tot)
      // fixed bin order: sum as an ordered fold over the collected bin list
      .select(col("bin"), (pb - pa).as("dp"), (log(pb) - log(pa)).as("dl"))
      .select(sort_array(collect_list(struct(col("bin"), (col("dp") * col("dl")).as("term"))))
        .as("terms"))
      .select(QueryDef.dec4(aggregate(col("terms"), lit(0.0),
        (acc, x) => acc + x.getField("term"))).as("psi"))
  }

  // slices: even vs odd doc_id over n_chars — near-identical distributions,
  // so the PSI is small but nonzero (the realistic monitoring value)
  private def q155(s: SparkSession, dir: String): DataFrame =
    psi(Tables.documents(s, dir), "n_chars", col("doc_id") % 2 === 0, 10)

  private val q155Sql =
    """WITH b AS (
      |  SELECT list_transform(quantile_cont(n_chars,
      |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
      |    x -> round(x, 4)) AS bs
      |  FROM documents WHERE doc_id % 2 = 0),
      |assigned AS (
      |  SELECT len(list_filter(bs, x -> round(CAST(n_chars AS DOUBLE), 4) > x))
      |      AS bin,
      |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS a
      |  FROM documents CROSS JOIN b),
      |counts AS (
      |  SELECT bin, CAST(sum(a) AS BIGINT) AS ca,
      |    CAST(sum(1 - a) AS BIGINT) AS cb
      |  FROM assigned GROUP BY 1),
      |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
      |  CAST(sum(cb) AS BIGINT) AS nb FROM counts),
      |terms AS (
      |  SELECT bin,
      |    (CAST(cb + 1 AS DOUBLE) / (nb + 10) - CAST(ca + 1 AS DOUBLE) / (na + 10)) *
      |    (ln(CAST(cb + 1 AS DOUBLE) / (nb + 10)) -
      |     ln(CAST(ca + 1 AS DOUBLE) / (na + 10))) AS term
      |  FROM counts CROSS JOIN tot),
      |folded AS (
      |  SELECT list_aggregate(list(term ORDER BY bin), 'sum') AS psi
      |  FROM terms)
      |SELECT CAST(CAST(psi AS DECIMAL(38,4)) AS VARCHAR) AS psi FROM folded""".stripMargin


  // ==== q156: Gini concentration of corpus mass =============================
  //
  // How unequal is the corpus? Token-frequency Gini ≈ 1 means a handful of
  // tokens carry all the mass (dedup/boilerplate debt); source-volume Gini
  // ≈ 1 means one crawl dominates the mixture. G = (2·Σ i·x₍ᵢ₎ − (n+1)·Σx)
  // / (n·Σx) over ascending-sorted masses — the rank window runs on the
  // GROUP table (vocab-sized / source-sized), never raw rows, and the
  // numerator is an exact BIGINT (ranks × integer masses), divided once.

  /** One Gini row per labeled mass table. `masses`: (dim, k, x). */
  def gini(masses: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("dim")).orderBy(col("x"), col("k"))
    masses.withColumn("i", row_number().over(w))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("i") * col("x")).as("six"))
      .select(col("dim"), col("n"),
        QueryDef.dec4((lit(2) * col("six") - (col("n") + 1) * col("sx"))
          .cast("double") / (col("n") * col("sx")).cast("double")).as("gini"))
  }

  private def q156(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val tokenMass = docs.select(explode(Tok.ws(col("text"))).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("x"))
      .select(lit("token_freq").as("dim"), col("k"), col("x"))
    val sourceMass = docs.groupBy(col("source").as("k"))
      .agg(sum(col("n_chars")).as("x"))
      .select(lit("source_chars").as("dim"), col("k"), col("x"))
    gini(tokenMass.unionByName(sourceMass)).orderBy(col("dim"))
  }

  private val q156Sql =
    """WITH masses AS (
      |  SELECT 'token_freq' AS dim, t AS k, CAST(count(*) AS BIGINT) AS x
      |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |        AS t FROM documents) GROUP BY 2
      |  UNION ALL
      |  SELECT 'source_chars', source, CAST(sum(n_chars) AS BIGINT)
      |  FROM documents GROUP BY 2),
      |ranked AS (
      |  SELECT dim, x,
      |    row_number() OVER (PARTITION BY dim ORDER BY x, k) AS i
      |  FROM masses),
      |m AS (
      |  SELECT dim, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
      |    CAST(sum(i * x) AS BIGINT) AS six
      |  FROM ranked GROUP BY 1)
      |SELECT dim, n,
      |  CAST(CAST(CAST(2 * six - (n + 1) * sx AS DOUBLE) /
      |    CAST(n * sx AS DOUBLE) AS DECIMAL(38,4)) AS VARCHAR) AS gini
      |FROM m ORDER BY dim""".stripMargin

  // ==== q157: top co-occurrence pairs by pointwise mutual information =======
  //
  // PMI(w₁, w₂) = ln(N·df₁₂ / (df₁·df₂)) over document-level co-occurrence
  // — the collocation/topic-structure statistic. The pair space comes from
  // per-doc DISTINCT token lists (bounded by the vocab cap per doc, the
  // PairCombos kernel again), never from a token×token cross join; dfs are
  // one map-side-combined aggregation each. At 100 TB the vocabulary is
  // first capped to the broadcast top-V head (the q137 pattern) so per-doc
  // pair fan-out is ≤ V². PMI takes ln of a ratio of exact integers;
  // ranking rounds to 4 dp with a (w1, w2) tie-break (the q37 discipline).

  /** Top-`k` token pairs by PMI among tokens with df ≥ `minDf`.
    *
    * Dense token ids come from the distributed exclusive prefix scan over
    * the df table sorted by token (count-of-one ⇒ 0-based rank in token
    * sort order) and attach to the exploded tokens via a BROADCAST join —
    * no vocab-sized plan literal, no per-token `array_position` scan. Ids
    * are assigned in token sort order, so `ia < ib` from the pair kernel
    * still means `w1 < w2` lexically (matching the oracle's `a.t < b.t`).
    * The id↔word map is the vocab-sized aggregate, broadcast thrice; the
    * raw token stream only ever hash-joins against it. */
  def pmiPairs(docs: DataFrame, minDf: Long, k: Int): DataFrame = {
    val nDocs = docs.count()
    val docToks = docs
      .select(col("doc_id"), explode(array_distinct(Tok.ws(col("text")))).as("t"))
    val dfTab = docToks.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    val vocabIds = graft.chunk.ChunkAssigner.withPrefixSum(
        dfTab.withColumn("__one", lit(1L)), Seq(col("t")), col("__one"),
        outName = "tid")
      .drop("__one")
    val byDoc = docToks
      .join(broadcast(vocabIds.select(col("t"), col("tid"))), Seq("t"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tid").as("doc_id"),
        lit(0L).as("p")))).as("members"))
    byDoc
      .select(explode(graft.functions.PairCombos.of(col("members"))).as("pr"))
      .groupBy(col("pr.doc_a").as("ia"), col("pr.doc_b").as("ib"))
      .agg(count(lit(1)).as("df12"))
      .join(broadcast(vocabIds.select(col("tid").as("ia"),
        col("t").as("w1"), col("df").as("df1"))), Seq("ia"))
      .join(broadcast(vocabIds.select(col("tid").as("ib"),
        col("t").as("w2"), col("df").as("df2"))), Seq("ib"))
      .select(col("w1"), col("w2"), col("df12"), col("df1"), col("df2"),
        log(lit(nDocs).cast("double") * col("df12").cast("double") /
          (col("df1") * col("df2")).cast("double")).as("pmi"))
      .orderBy(round(col("pmi"), 4).desc, col("w1"), col("w2"))
      .limit(k)
  }

  private def q157(s: SparkSession, dir: String): DataFrame =
    pmiPairs(Tables.documents(s, dir).select(col("doc_id"), col("text")),
      minDf = 5, k = 20)
      .select(col("w1"), col("w2"), col("df12"), col("df1"), col("df2"),
        QueryDef.dec4(col("pmi")).as("pmi"))

  private val q157Sql =
    """WITH n AS (SELECT count(*) AS nd FROM documents),
      |dt AS (
      |  SELECT DISTINCT doc_id, t FROM (
      |    SELECT doc_id,
      |      unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |    FROM documents)),
      |dfs AS (
      |  SELECT t, count(*) AS df FROM dt GROUP BY 1 HAVING count(*) >= 5),
      |dt2 AS (SELECT dt.doc_id, dt.t FROM dt JOIN dfs USING (t)),
      |pairs AS (
      |  SELECT a.t AS w1, b.t AS w2, count(*) AS df12
      |  FROM dt2 a JOIN dt2 b ON a.doc_id = b.doc_id AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT w1, w2, df12, d1.df AS df1, d2.df AS df2,
      |  CAST(CAST(ln(CAST(nd AS DOUBLE) * CAST(df12 AS DOUBLE) /
      |    CAST(d1.df * d2.df AS DOUBLE)) AS DECIMAL(38,4)) AS VARCHAR) AS pmi
      |FROM pairs JOIN dfs d1 ON d1.t = w1 JOIN dfs d2 ON d2.t = w2
      |CROSS JOIN n
      |ORDER BY round(ln(CAST(nd AS DOUBLE) * CAST(df12 AS DOUBLE) /
      |  CAST(d1.df * d2.df AS DOUBLE)), 4) DESC, w1, w2
      |LIMIT 20""".stripMargin

  // ==== q183: Zipf-law fit over the token frequency spectrum ================
  //
  // How Zipfian is the corpus — the one-number natural-language sanity
  // check (machine-generated/boilerplate text bends away from slope −1).
  // Fit ln(freq) ~ ln(rank) by least squares with the q99 integer-log
  // discipline: both logs are floored to micro-nat INTEGERS per distinct
  // token (one ln each, same double on both engines), so the regression
  // moments are exact integer sums (DECIMAL-accumulated, the q163 rule)
  // and the slope/r² divide identically-derived doubles — no
  // float-summation-order dependence anywhere. Rank comes from the
  // distributed prefix scan (count desc, token), like q168.

  /** One row: (n_tokens, slope, r2) of ln freq vs ln rank, over tokens
    * with freq ≥ `minFreq`. */
  def zipfFit(docs: DataFrame, minFreq: Long): DataFrame = {
    val counts = docs.select(explode(Tok.ws(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minFreq)
    val ranked = graft.chunk.ChunkAssigner.withPrefixSum(
      counts.withColumn("__one", lit(1L)),
      Seq(col("cnt").desc, col("t")), col("__one"), outName = "r0")
    val xy = ranked.select(
      floor(lit(1e6) * log(col("r0").cast("double") + 1.0))
        .cast("decimal(18,0)").as("x"),
      floor(lit(1e6) * log(col("cnt").cast("double")))
        .cast("decimal(18,0)").as("y"))
    val m = xy.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("sxy") - d("sx") * d("sy")
    val denX = n * d("sxx") - d("sx") * d("sx")
    val denY = n * d("syy") - d("sy") * d("sy")
    m.select(col("n").as("n_tokens"),
      when(denX > 0, num / denX).as("slope"),
      when(denX > 0 && denY > 0, num * num / (denX * denY)).as("r2"))
  }

  private def q183(s: SparkSession, dir: String): DataFrame =
    zipfFit(Tables.documents(s, dir), minFreq = 5)
      .select(col("n_tokens"), QueryDef.dec4(col("slope")).as("slope"),
        QueryDef.dec4(col("r2")).as("r2"))

  private val q183Sql =
    """WITH counts AS (
      |  SELECT t, count(*) AS cnt FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS t FROM documents)
      |  GROUP BY 1 HAVING count(*) >= 5),
      |ranked AS (
      |  SELECT cnt,
      |    row_number() OVER (ORDER BY cnt DESC, t) - 1 AS r0
      |  FROM counts),
      |xy AS (
      |  SELECT CAST(floor(1e6 * ln(CAST(r0 AS DOUBLE) + 1.0))
      |      AS DECIMAL(18,0)) AS x,
      |    CAST(floor(1e6 * ln(CAST(cnt AS DOUBLE))) AS DECIMAL(18,0)) AS y
      |  FROM ranked),
      |m AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM xy)
      |SELECT n AS n_tokens,
      |  CAST(CAST(CASE WHEN
      |      CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS slope,
      |  CAST(CAST(CASE WHEN
      |      CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS r2
      |FROM m""".stripMargin

  // ==== q225: Heaps-law vocabulary growth fit ================================
  //
  // Zipf's companion (q183 fits the frequency SPECTRUM; this fits the
  // GROWTH curve): Heaps' law V(n) ≈ K·n^β says how fast new vocabulary
  // appears as the corpus grows — the number every tokenizer-budget and
  // corpus-size decision reads off. Corpus order = doc_id order. The
  // naive curve needs a running scan; distributed, both cumulative series
  // come from the SAME exclusive-prefix-scan machinery as q122/q183:
  //   V(d) = # tokens whose FIRST document is ≤ d  — first-doc = one
  //          min() groupBy to the token domain, then a prefix sum of
  //          new-token counts over the doc domain;
  //   n(d) = cumulative token count — a prefix sum of per-doc lengths.
  // The log-log OLS then follows the q183 discipline to the letter: one
  // ln per DOC floored to micro-nat integers, exact DECIMAL moments, two
  // double divisions at render.

  /** One row: (n_docs, beta, r2) of the log-log Heaps fit over the
    * doc-id-ordered growth curve of `docs` (doc_id, text). */
  def heapsFit(docs: DataFrame): DataFrame = {
    val docTok = docs.select(col("doc_id"), explode(Tok.ws(col("text"))).as("t"))
    val newPerDoc = docTok.groupBy(col("t")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nv"))
    val perDoc = docs
      .select(col("doc_id"), size(Tok.ws(col("text"))).cast("long").as("nt"))
      .join(newPerDoc, Seq("doc_id"), "left")
      .withColumn("nv", coalesce(col("nv"), lit(0L)))
    val cumV = graft.chunk.ChunkAssigner.withPrefixSum(
      perDoc, Seq(col("doc_id")), col("nv"), outName = "cv0")
    val cum = graft.chunk.ChunkAssigner.withPrefixSum(
      cumV, Seq(col("doc_id")), col("nt"), outName = "cn0")
      .select((col("cv0") + col("nv")).as("v"), (col("cn0") + col("nt")).as("n"))
      .filter(col("v") > 0 && col("n") > 0)
    val xy = cum.select(
      floor(lit(1e6) * log(col("n").cast("double"))).cast("decimal(18,0)").as("x"),
      floor(lit(1e6) * log(col("v").cast("double"))).cast("decimal(18,0)").as("y"))
    val m = xy.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("sxy") - d("sx") * d("sy")
    val denX = n * d("sxx") - d("sx") * d("sx")
    val denY = n * d("syy") - d("sy") * d("sy")
    m.select(col("n").as("n_docs"),
      when(denX > 0, num / denX).as("beta"),
      when(denX > 0 && denY > 0, num * num / (denX * denY)).as("r2"))
  }

  private def q225(s: SparkSession, dir: String): DataFrame =
    heapsFit(Tables.documents(s, dir))
      .select(col("n_docs"), QueryDef.dec4(col("beta")).as("beta"),
        QueryDef.dec4(col("r2")).as("r2"))

  private val q225Sql =
    """WITH dt AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
      |  FROM documents),
      |npd AS (
      |  SELECT doc_id, count(*) AS nv FROM (
      |    SELECT t, min(doc_id) AS doc_id FROM dt GROUP BY t)
      |  GROUP BY doc_id),
      |pd AS (
      |  SELECT d.doc_id,
      |    CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
      |      AS BIGINT) AS nt,
      |    COALESCE(npd.nv, 0) AS nv
      |  FROM documents d LEFT JOIN npd USING (doc_id)),
      |cum AS (
      |  SELECT sum(nv) OVER (ORDER BY doc_id) AS v,
      |    sum(nt) OVER (ORDER BY doc_id) AS n
      |  FROM pd),
      |xy AS (
      |  SELECT CAST(floor(1e6 * ln(CAST(n AS DOUBLE))) AS DECIMAL(18,0)) AS x,
      |    CAST(floor(1e6 * ln(CAST(v AS DOUBLE))) AS DECIMAL(18,0)) AS y
      |  FROM cum WHERE v > 0 AND n > 0),
      |m AS (
      |  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |  FROM xy)
      |SELECT n AS n_docs,
      |  CAST(CAST(CASE WHEN
      |      CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS beta,
      |  CAST(CAST(CASE WHEN
      |      CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
      |      AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0
      |    THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    END AS DECIMAL(38,4)) AS VARCHAR) AS r2
      |FROM m""".stripMargin

  // ==== q259: Dunning log-likelihood (G²) collocations =======================
  //
  // The collocation test that behaves at LOW counts where q157's PMI
  // explodes (Dunning 1993): for each ADJACENT bigram (a,b), G² =
  // 2·Σ_cells O·ln(O·N/(R·C)) over the 2×2 contingency of "next-word is
  // b" vs "current word is a" — sequential collocation, complementary to
  // PMI's document-level co-occurrence. Margins come from the bigram
  // table itself (R_a = bigrams starting with a, C_b = ending with b), so
  // the corpus-sized work is ONE bigram explode + count; margins are two
  // token-domain rollups joined back on their keys. G² is one double
  // expression per DISTINCT bigram row from exact integers (identical
  // operands both engines); ranking uses ⌊10⁶·G²⌋ with (a,b) tie-break.

  /** Top-`k` adjacent-bigram collocations with count ≥ `minCount`:
    * (a, b, n_ab, g2_micro, g2). */
  def collocationsG2(docs: DataFrame, minCount: Long, k: Int): DataFrame = {
    val t = Tok.ws(col("text"))
    // The explicit non-null filter is a no-op on the data (adjacent-token
    // pairs are never null) but load-bearing for the PLAN: `cnt` feeds four
    // consumers (pair counts, both marginals, the grand total), and without
    // it the optimizer pushes DIFFERENT inferred isnotnull() predicates
    // from each join into each branch's scan, so the four Exchange
    // subtrees stop canonicalizing equal and ReuseExchange dies — the
    // corpus was tokenized + exploded FOUR times (plans/r15/
    // q259_collocations_g2_before.txt: 4× Scan parquet + Generate). With
    // every branch carrying the same filter, the (a, b) exchange subtree
    // is identical everywhere and the explode runs once (guide §2.4).
    val big = docs.select(explode(when(size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + lit(1)).as("a"),
          element_at(t, i + lit(2)).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
    val cnt = big.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
    val ra = cnt.groupBy(col("a")).agg(sum(col("c")).as("ra"))
    val cb = cnt.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val n = broadcast(cnt.agg(sum(col("c")).as("n")))
    def dd(c: Column) = c.cast("double")
    def term(o: Column, r: Column, cc: Column) =
      when(o > 0, dd(o) * log(dd(o) * dd(col("n")) / (dd(r) * dd(cc))))
        .otherwise(lit(0.0))
    val o11 = col("c"); val o12 = col("ra") - col("c")
    val o21 = col("cb") - col("c")
    val o22 = col("n") - col("ra") - col("cb") + col("c")
    val r2 = col("n") - col("ra"); val c2 = col("n") - col("cb")
    val g2 = lit(2.0) * (term(o11, col("ra"), col("cb")) +
      term(o12, col("ra"), c2) + term(o21, r2, col("cb")) +
      term(o22, r2, c2))
    cnt.filter(col("c") >= minCount)
      .join(ra, Seq("a")).join(cb, Seq("b")).crossJoin(n)
      .select(col("a"), col("b"), col("c").as("n_ab"),
        floor(lit(1e6) * g2).cast("long").as("g2_micro"),
        QueryDef.dec4(g2).as("g2"))
      .orderBy(col("g2_micro").desc, col("a"), col("b"))
      .limit(k)
  }

  private def q259(s: SparkSession, dir: String): DataFrame =
    collocationsG2(Tables.documents(s, dir), minCount = 5L, k = 20)

  private val q259Sql = {
    def term(o: String, r: String, c: String) =
      s"""CASE WHEN $o > 0 THEN CAST($o AS DOUBLE)
         |    * ln(CAST($o AS DOUBLE) * CAST(n AS DOUBLE)
         |      / (CAST($r AS DOUBLE) * CAST($c AS DOUBLE)))
         |    ELSE 0.0 END""".stripMargin
    val g2 = s"""2.0 * (${term("c", "ra", "cb")}
       | + ${term("(ra - c)", "ra", "(n - cb)")}
       | + ${term("(cb - c)", "(n - ra)", "cb")}
       | + ${term("(n - ra - cb + c)", "(n - ra)", "(n - cb)")})"""
      .stripMargin
    s"""WITH big AS (
       |  SELECT p[1] AS a, p[2] AS b FROM (
       |    SELECT unnest(CASE WHEN len(toks) >= 2 THEN
       |      list_transform(range(1, len(toks)),
       |        i -> [toks[i], toks[i + 1]]) ELSE [] END) AS p
       |    FROM (SELECT list_filter(string_split(text, ' '),
       |      x -> x <> '') AS toks FROM documents))),
       |cnt AS (SELECT a, b, count(*) AS c FROM big GROUP BY a, b),
       |ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ra FROM cnt GROUP BY a),
       |cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cnt GROUP BY b),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt)
       |SELECT a, b, c AS n_ab,
       |  CAST(floor(1000000.0 * ($g2)) AS BIGINT) AS g2_micro,
       |  CAST(CAST(($g2) AS DECIMAL(38,4)) AS VARCHAR) AS g2
       |FROM cnt JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot
       |WHERE c >= 5
       |ORDER BY g2_micro DESC, a, b LIMIT 20""".stripMargin
  }

  // ==== q257: leave-one-source-out influence ================================
  //
  // The "which source is hurting the corpus?" diagnostic — the algebraic
  // core of data valuation: for every source s, what happens to the
  // corpus-level metric when s is removed? For mean-type metrics the
  // leave-one-out needs NO second pass: mean_{¬s} = (T − t_s)/(N − n_s)
  // from the same per-source aggregates that produce the overall mean.
  // Two metrics: mean doc length (chars) and English fraction. Exactness:
  // all sums are integers; each influence is ONE double expression per
  // SOURCE row (micro-floored would be overkill — dec4 renders the
  // identical doubles both engines compute from identical integers).
  // Scale shape: one corpus pass → source-domain groupBy → broadcast of
  // the 1-row totals.

  /** Per source: (source, n_docs, mean_chars_all, mean_chars_without,
    * chars_influence, en_frac_without, en_influence) — positive influence
    * = the metric RISES when the source is dropped. */
  def sourceInfluence(docs: DataFrame): DataFrame = {
    val per = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_s"),
        sum(col("n_chars")).cast("decimal(38,0)").as("t_s"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("e_s"))
    val tot = broadcast(per.agg(sum(col("n_s")).as("n"),
      sum(col("t_s")).as("t"), sum(col("e_s")).as("e")))
    def dd(c: Column) = c.cast("double")
    val meanAll = dd(col("t")) / dd(col("n"))
    val meanWo = (dd(col("t")) - dd(col("t_s"))) /
      (dd(col("n")) - dd(col("n_s")))
    val enAll = dd(col("e")) / dd(col("n"))
    val enWo = (dd(col("e")) - dd(col("e_s"))) /
      (dd(col("n")) - dd(col("n_s")))
    per.crossJoin(tot)
      .select(col("source"), col("n_s").as("n_docs"),
        QueryDef.dec4(meanAll).as("mean_chars_all"),
        QueryDef.dec4(meanWo).as("mean_chars_without"),
        QueryDef.dec4(meanWo - meanAll).as("chars_influence"),
        QueryDef.dec4(enWo).as("en_frac_without"),
        QueryDef.dec4(enWo - enAll).as("en_influence"))
      .orderBy(col("source"))
  }

  private def q257(s: SparkSession, dir: String): DataFrame =
    sourceInfluence(graft.Tables.documents(s, dir))

  private val q257Sql =
    """WITH per AS (
      |  SELECT source, count(*) AS n_s,
      |    CAST(sum(n_chars) AS HUGEINT) AS t_s,
      |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS e_s
      |  FROM documents GROUP BY source),
      |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n, sum(t_s) AS t,
      |  CAST(sum(e_s) AS BIGINT) AS e FROM per)
      |SELECT source, n_s AS n_docs,
      |  CAST(CAST(CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mean_chars_all,
      |  CAST(CAST((CAST(t AS DOUBLE) - CAST(t_s AS DOUBLE))
      |      / (CAST(n AS DOUBLE) - CAST(n_s AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS mean_chars_without,
      |  CAST(CAST((CAST(t AS DOUBLE) - CAST(t_s AS DOUBLE))
      |      / (CAST(n AS DOUBLE) - CAST(n_s AS DOUBLE))
      |      - CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS chars_influence,
      |  CAST(CAST((CAST(e AS DOUBLE) - CAST(e_s AS DOUBLE))
      |      / (CAST(n AS DOUBLE) - CAST(n_s AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS en_frac_without,
      |  CAST(CAST((CAST(e AS DOUBLE) - CAST(e_s AS DOUBLE))
      |      / (CAST(n AS DOUBLE) - CAST(n_s AS DOUBLE))
      |      - CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS en_influence
      |FROM per CROSS JOIN tot ORDER BY source""".stripMargin

  // ==== q313: Herfindahl–Hirschman concentration ==============================
  //
  // The squared-share companion to q156's Gini: HHI = Σ_s (m_s/M)² over
  // source shares of corpus mass per language — the antitrust-standard
  // "is this slice dominated by one provider" number training-mixture
  // reviews quote (1/HHI = effective source count). Exactness: HHI =
  // Σm² / M² is one division of exact decimals, ⌊10⁶·⌋-floored once;
  // the only corpus-sized work is the (lang, source) groupBy.

  /** Per `grpCol`: (grp, n_shares, hhi_e6, eff_sources_e6) over `massCol`
    * mass shares of `shareCol`. */
  def herfindahl(df: DataFrame, grpCol: String, shareCol: String,
      massCol: String): DataFrame = {
    val shares = df.groupBy(col(grpCol).as("grp"), col(shareCol).as("s"))
      .agg(sum(col(massCol)).cast("decimal(38,0)").as("m"))
    def dd(c: org.apache.spark.sql.Column) = c.cast("double")
    shares.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_shares"),
        sum(col("m") * col("m")).as("sm2"), sum(col("m")).as("mm"))
      .select(col("grp"), col("n_shares"),
        floor(lit(1e6) * dd(col("sm2")) / dd(col("mm") * col("mm")))
          .cast("long").as("hhi_e6"))
      .withColumn("eff_sources_e6",
        floor(lit(1e6) * lit(1e6) / col("hhi_e6").cast("double"))
          .cast("long"))
  }

  private def q313(s: SparkSession, dir: String): DataFrame =
    herfindahl(Tables.documents(s, dir), "lang", "source", "n_chars")
      .select(col("grp").as("lang"), col("n_shares"), col("hhi_e6"),
        col("eff_sources_e6"))
      .orderBy(col("lang"))

  private val q313Sql =
    """WITH shares AS (
      |  SELECT lang, source, CAST(sum(n_chars) AS HUGEINT) AS m
      |  FROM documents GROUP BY 1, 2),
      |g AS (
      |  SELECT lang, count(*) AS n_shares,
      |    CAST(sum(m * m) AS HUGEINT) AS sm2,
      |    CAST(sum(m) AS HUGEINT) AS mm
      |  FROM shares GROUP BY 1),
      |h AS (
      |  SELECT lang, n_shares,
      |    CAST(floor(1e6 * CAST(sm2 AS DOUBLE)
      |      / CAST(mm * mm AS DOUBLE)) AS BIGINT) AS hhi_e6
      |  FROM g)
      |SELECT lang, n_shares, hhi_e6,
      |  CAST(floor(1e6 * 1e6 / CAST(hhi_e6 AS DOUBLE)) AS BIGINT)
      |    AS eff_sources_e6
      |FROM h ORDER BY lang""".stripMargin

  // ==== q314: Monroe log-odds keyness (informative Dirichlet prior) ==========
  //
  // "Fightin' Words" (Monroe–Colaresi–Quinn 2008): which words
  // distinguish slice A from slice B, without the low-frequency
  // explosion raw log-odds or PMI suffer — the pooled corpus is the
  // Dirichlet prior (α_w = α₀·y_w/n), and each word gets
  // z = δ̂ / √(1/(y₁+α_w) + 1/(y₂+α_w)) with δ̂ the prior-smoothed
  // log-odds difference. Exactness: every ln/⁻¹ argument collapses to a
  // ratio of exact decimal products (y₁·n + α₀·y_w etc. — the prior's
  // rational form multiplied through), so both engines ln/divide the
  // identical doubles; one vocab-domain pass past the token groupBy.

  /** Per token with pooled count ≥ `minCount`: (t, y1, y2, z) — Monroe
    * log-odds z of slice A (`sideA` docs) vs the rest, prior mass
    * `alpha0`. */
  def monroeKeyness(docs: DataFrame, sideA: Column, alpha0: Long,
      minCount: Long): DataFrame = {
    val toks = docs.select(explode(Tok.ws(col("text"))).as("t"),
      when(sideA, 1L).otherwise(0L).as("a"))
    val counts = toks.groupBy(col("t"))
      .agg(sum(col("a")).as("y1"), sum(lit(1L) - col("a")).as("y2"))
      .filter(col("y1") + col("y2") >= minCount)
    val tot = broadcast(counts.agg(sum(col("y1")).as("n1"),
      sum(col("y2")).as("n2"),
      sum(col("y1") + col("y2")).as("n")))
    def d0(c: Column) = c.cast("decimal(38,0)")
    def dd(c: Column) = c.cast("double")
    val w = counts.crossJoin(tot)
      .withColumn("yw", col("y1") + col("y2"))
      // prior-smoothed numerators/denominators, multiplied through by n
      // so every term is an exact integer product
      .withColumn("p1n", d0(col("y1")) * col("n") + d0(lit(alpha0)) * col("yw"))
      .withColumn("q1n", d0(col("n1")) * col("n") + d0(lit(alpha0)) * col("n")
        - d0(col("y1")) * col("n") - d0(lit(alpha0)) * col("yw"))
      .withColumn("p2n", d0(col("y2")) * col("n") + d0(lit(alpha0)) * col("yw"))
      .withColumn("q2n", d0(col("n2")) * col("n") + d0(lit(alpha0)) * col("n")
        - d0(col("y2")) * col("n") - d0(lit(alpha0)) * col("yw"))
      .withColumn("delta",
        log(dd(col("p1n")) / dd(col("q1n"))) -
          log(dd(col("p2n")) / dd(col("q2n"))))
      .withColumn("v",
        dd(col("n")) / dd(col("p1n")) + dd(col("n")) / dd(col("p2n")))
      .withColumn("z", col("delta") / sqrt(col("v")))
    w.select(col("t"), col("y1"), col("y2"), col("z"))
  }

  private def q314(s: SparkSession, dir: String): DataFrame =
    monroeKeyness(Tables.documents(s, dir).select(col("text"), col("lang")),
      col("lang") === "en", alpha0 = 1000L, minCount = 5L)
      .orderBy(col("z").desc, col("t")).limit(20)
      .select(col("t"), col("y1"), col("y2"), QueryDef.dec4(col("z")).as("z"))

  private val q314Sql =
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
      |    AS t,
      |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a
      |  FROM documents),
      |c AS (
      |  SELECT t, CAST(sum(a) AS BIGINT) AS y1,
      |    CAST(sum(1 - a) AS BIGINT) AS y2
      |  FROM toks GROUP BY t HAVING sum(a) + sum(1 - a) >= 5),
      |tot AS (
      |  SELECT CAST(sum(y1) AS BIGINT) AS n1, CAST(sum(y2) AS BIGINT)
      |    AS n2, CAST(sum(y1 + y2) AS BIGINT) AS n FROM c),
      |w AS (
      |  SELECT t, y1, y2,
      |    CAST(y1 AS HUGEINT) * n + 1000 * CAST(y1 + y2 AS HUGEINT) AS p1n,
      |    CAST(n1 AS HUGEINT) * n + 1000 * CAST(n AS HUGEINT)
      |      - CAST(y1 AS HUGEINT) * n - 1000 * CAST(y1 + y2 AS HUGEINT)
      |      AS q1n,
      |    CAST(y2 AS HUGEINT) * n + 1000 * CAST(y1 + y2 AS HUGEINT) AS p2n,
      |    CAST(n2 AS HUGEINT) * n + 1000 * CAST(n AS HUGEINT)
      |      - CAST(y2 AS HUGEINT) * n - 1000 * CAST(y1 + y2 AS HUGEINT)
      |      AS q2n,
      |    n
      |  FROM c CROSS JOIN tot)
      |SELECT t, y1, y2,
      |  CAST(CAST((ln(CAST(p1n AS DOUBLE) / CAST(q1n AS DOUBLE))
      |      - ln(CAST(p2n AS DOUBLE) / CAST(q2n AS DOUBLE)))
      |    / sqrt(CAST(n AS DOUBLE) / CAST(p1n AS DOUBLE)
      |      + CAST(n AS DOUBLE) / CAST(p2n AS DOUBLE))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS z
      |FROM w
      |ORDER BY (ln(CAST(p1n AS DOUBLE) / CAST(q1n AS DOUBLE))
      |    - ln(CAST(p2n AS DOUBLE) / CAST(q2n AS DOUBLE)))
      |  / sqrt(CAST(n AS DOUBLE) / CAST(p1n AS DOUBLE)
      |    + CAST(n AS DOUBLE) / CAST(p2n AS DOUBLE)) DESC, t
      |LIMIT 20""".stripMargin

  // ==== q320: Shannon diversity + Pielou evenness =============================
  //
  // The entropy-side companion to q313's HHI (HHI weighs big shares,
  // Shannon weighs the tail — a slice with 1 dominant + 50 trace
  // sources scores concentrated on HHI but diverse on H): per language,
  // H = Σ p_s·ln(1/p_s) over source mass shares and Pielou J = H/ln k.
  // Exactness: each term's argument is the exact integer ratio m/M, the
  // term is ⌊10⁹·(m/M)·ln(M/m)⌋-floored ONCE so the cross-source sum is
  // an exact integer at any source count; J floors once more at 10⁶.

  /** Per `grpCol`: (grp, n_shares, shannon_e9, evenness_e6). */
  def shannonDiversity(df: DataFrame, grpCol: String, shareCol: String,
      massCol: String): DataFrame = {
    val shares = df.groupBy(col(grpCol).as("grp"), col(shareCol).as("s"))
      .agg(sum(col(massCol)).cast("decimal(38,0)").as("m"))
    val tot = shares.groupBy(col("grp")).agg(sum(col("m")).as("mm"),
      count(lit(1)).as("n_shares"))
    def dd(c: Column) = c.cast("double")
    val terms = shares.join(tot, Seq("grp"))
      .withColumn("t", when(col("m") > 0 && col("m") < col("mm"),
        floor(lit(1e9) * (dd(col("m")) / dd(col("mm"))) *
          log(dd(col("mm")) / dd(col("m")))).cast("long"))
        .otherwise(0L))
    terms.groupBy(col("grp"))
      .agg(max(col("n_shares")).as("n_shares"),
        sum(col("t")).as("shannon_e9"))
      .withColumn("evenness_e6", when(col("n_shares") > 1,
        floor(lit(1e6) * col("shannon_e9").cast("double") /
          (lit(1e9) * log(col("n_shares").cast("double")))).cast("long")))
  }

  private def q320(s: SparkSession, dir: String): DataFrame =
    shannonDiversity(Tables.documents(s, dir), "lang", "source", "n_chars")
      .select(col("grp").as("lang"), col("n_shares"), col("shannon_e9"),
        col("evenness_e6"))
      .orderBy(col("lang"))

  private val q320Sql =
    """WITH shares AS (
      |  SELECT lang, source, CAST(sum(n_chars) AS HUGEINT) AS m
      |  FROM documents GROUP BY 1, 2),
      |tot AS (
      |  SELECT lang, CAST(sum(m) AS HUGEINT) AS mm, count(*) AS n_shares
      |  FROM shares GROUP BY 1),
      |terms AS (
      |  SELECT shares.lang, n_shares,
      |    CASE WHEN m > 0 AND m < mm THEN
      |      CAST(floor(1e9 * (CAST(m AS DOUBLE) / CAST(mm AS DOUBLE))
      |        * ln(CAST(mm AS DOUBLE) / CAST(m AS DOUBLE))) AS BIGINT)
      |    ELSE 0 END AS t
      |  FROM shares JOIN tot USING (lang))
      |SELECT lang, max(n_shares) AS n_shares,
      |  CAST(sum(t) AS BIGINT) AS shannon_e9,
      |  CAST(CASE WHEN max(n_shares) > 1 THEN
      |    floor(1e6 * CAST(sum(t) AS DOUBLE)
      |      / (1e9 * ln(CAST(max(n_shares) AS DOUBLE)))) END AS BIGINT)
      |    AS evenness_e6
      |FROM terms GROUP BY lang ORDER BY lang""".stripMargin

  // ==== q355: vocabulary coverage — Good–Turing missing mass + Chao1 ========
  //
  // The sampling-completeness question behind every vocab-dependent
  // decision (B87 OOV rate, tokenizer training size, Heaps q225
  // extrapolation): how much of the language have we NOT seen? Two
  // classical estimators off the frequency-of-frequencies: Good–Turing
  // missing mass P(unseen) ≈ n₁/N (the probability the next token is a
  // new type — Good 1953), and the bias-corrected Chao1 richness floor
  // V + n₁(n₁−1)/(2(n₂+1)) (defined even at n₂ = 0). Exactness: all
  // inputs are exact integers off one (source, word) count; each output
  // is ONE spelled double chain. Scale shape: one corpus tokenize +
  // groupBy, then source-domain arithmetic.

  /** Per source: (source, vocab, n_tokens, n1, n2, missing_mass,
    * chao1). */
  def vocabCoverage(docs: DataFrame): DataFrame = {
    val wc = docs
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    def dd(c: Column) = c.cast("double")
    wc.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("vocab"), col("n_tokens"), col("n1"),
        col("n2"),
        QueryDef.dec4(dd(col("n1")) / dd(col("n_tokens")))
          .as("missing_mass"),
        QueryDef.dec4(dd(col("vocab")) +
          dd(col("n1")) * (dd(col("n1")) - lit(1.0)) /
            (lit(2.0) * (dd(col("n2")) + lit(1.0)))).as("chao1"))
  }

  private def q355(s: SparkSession, dir: String): DataFrame =
    vocabCoverage(Tables.documents(s, dir)).orderBy(col("source"))

  private val q355Sql =
    """WITH t AS (
      |  SELECT source, unnest(string_split(lower(text), ' ')) AS w
      |  FROM documents),
      |wc AS (
      |  SELECT source, w, CAST(count(*) AS BIGINT) AS c
      |  FROM t GROUP BY 1, 2),
      |m AS (
      |  SELECT source, count(*) AS vocab, CAST(sum(c) AS BIGINT)
      |      AS n_tokens,
      |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |  FROM wc GROUP BY 1)
      |SELECT source, vocab, n_tokens, n1, n2,
      |  CAST(CAST(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE)
      |    AS DECIMAL(38,4)) AS VARCHAR) AS missing_mass,
      |  CAST(CAST(CAST(vocab AS DOUBLE)
      |      + CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)
      |        / (2.0 * (CAST(n2 AS DOUBLE) + 1.0))
      |    AS DECIMAL(38,4)) AS VARCHAR) AS chao1
      |FROM m ORDER BY source""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q355_vocab_coverage", q355, Some(q355Sql)),
    QueryDef("q320_shannon_diversity", q320, Some(q320Sql)),
    QueryDef("q314_monroe_keyness", q314, Some(q314Sql)),
    QueryDef("q313_herfindahl", q313, Some(q313Sql)),
    QueryDef("q259_collocations_g2", q259, Some(q259Sql)),
    QueryDef("q257_source_influence", q257, Some(q257Sql)),
    QueryDef("q225_heaps_fit", q225, Some(q225Sql)),
    QueryDef("q183_zipf_fit", q183, Some(q183Sql)),
    QueryDef("q135_char_entropy", q135, Some(q135Sql)),
    QueryDef("q136_source_overlap", q136, Some(q136Sql)),
    QueryDef("q137_oov_rate", q137, Some(q137Sql)),
    QueryDef("q147_ngram_novelty", q147, Some(q147Sql)),
    QueryDef("q154_token_burstiness", q154, Some(q154Sql)),
    QueryDef("q155_psi", q155, Some(q155Sql)),
    QueryDef("q156_gini", q156, Some(q156Sql)),
    QueryDef("q157_pmi_pairs", q157, Some(q157Sql)))
}
