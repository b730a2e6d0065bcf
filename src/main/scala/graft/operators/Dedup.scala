package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM training-data pipelines: MinHash+LSH,
  * SimHash, and exact n-gram Jaccard via an inverted shingle index.
  *
  * Scale design (the whole point of these over naive O(n²)):
  *   - the pairwise space is only ever materialized for CANDIDATES — docs
  *     sharing an LSH band bucket / simhash band / shingle — never for the
  *     full corpus;
  *   - every hash is a seeded xxhash64 built-in (codegen'd, no UDFs);
  *   - bucket joins are plain shuffles on short keys; hot buckets are the
  *     classic skew case — the shingle index drops top-frequency shingles
  *     (stopword-shingle suppression) to bound bucket fan-out.
  *
  * Approximate operators are not oracle-hashed (SURVEY.md §2: B30 excluded);
  * they get rows-only driver checks plus ground-truth recall tests in
  * DedupSpec against exact Jaccard at sf0.001.
  */
object Dedup {

  /** Word-level n-gram shingles of the (pre-lowercased) text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = filter(split(text, " "), x => x =!= "")
    // sliding n-grams via transform over start positions
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** MinHash signature: for seed s, sig(s) = min over shingles of
    * xxhash64(s, shingle). One array column of H mins. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    array((0 until numHashes).map { s =>
      array_min(transform(shingleCol, sh => xxhash64(lit(s), sh)))
    }: _*)

  /** LSH banding: split the H-wide signature into `bands` groups of `rowsPerBand`
    * and hash each group — docs agreeing on ANY band become candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))
    }: _*)

  /** Candidate pairs from MinHash-LSH, verified with exact Jaccard over
    * shingle sets. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b. */
  def minhashCandidates(docs: DataFrame, shingleN: Int = 3,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val withSig = docs
      .withColumn("sh", shingles(col("text"), shingleN))
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .select(col("doc_id"), col("sh"), explode(bandKeys(col("sig"), bands, rows)).as("bk"))
    val a = withSig.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("bk"))
    val b = withSig.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("bk"))
    a.join(b, a("bk") === b("bk") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over tokens: bit i of the fingerprint is the sign of the
    * vote sum over token-hash bit i. Pure column program (no UDF): a 64-wide
    * vote vector is zip_with-accumulated over the token hashes; shifts are
    * unrolled over constant bit positions (the Column API has no
    * variable-amount shift). */
  def simhashVotes(text: Column): Column = {
    val toks = filter(split(text, " "), x => x =!= "")
    aggregate(
      transform(toks, t => xxhash64(t)),
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(b =>
          when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L)): _*),
        (a, v) => a + v))
  }

  /** Fold the 64 vote counters (a materialized column) into the fingerprint. */
  def simhashFromVotes(votes: Column): Column =
    (0 until 64).map(b =>
      when(element_at(votes, b + 1) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_.bitwiseOR(_))

  /** SimHash near-dup candidates: docs sharing any 16-bit band of the 64-bit
    * fingerprint, ranked by exact Hamming distance. */
  def simhashCandidates(docs: DataFrame, maxHamming: Int = 8): DataFrame = {
    val withFp = docs.withColumn("votes", simhashVotes(col("text")))
      .withColumn("fp", simhashFromVotes(col("votes")))
      .select(col("doc_id"), col("fp"),
        explode(array((0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftright(col("fp"), b * 16).bitwiseAND(0xFFFFL).as("key"))
        }: _*)).as("bk"))
    val a = withFp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"), col("bk"))
    val b = withFp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"), col("bk"))
    a.join(b, a("bk") === b("bk") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("fp_a"), col("fp_b")).distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard via inverted shingle index — the scalable exact
    * path: explode shingles, join on shingle (skew-capped by dropping the
    * most frequent shingles), count shared shingles per pair, derive Jaccard
    * from |A|+|B|-shared. No full cross join ever exists. */
  def ngramJaccardPairs(docs: DataFrame, shingleN: Int = 3,
      maxShingleFreq: Int = 50): DataFrame = {
    val withSh = docs
      .withColumn("sh", shingles(col("text"), shingleN))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("n_sh"))
    val inverted = withSh.select(col("doc_id"), col("n_sh"), explode(col("sh")).as("s"))
    // skew cap: a shingle shared by half the corpus creates a quadratic
    // bucket and carries no discriminative signal — drop it
    val rare = inverted.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleFreq)
    val pruned = inverted.join(rare.select("s"), Seq("s"))
    val a = pruned.select(col("s"), col("doc_id").as("doc_a"), col("n_sh").as("na"))
    val b = pruned.select(col("s"), col("doc_id").as("doc_b"), col("n_sh").as("nb"))
    a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard", col("shared") / (col("na") + col("nb") - col("shared")))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("jaccard"))
  }

  // -- query entries (rows-only driver checks; approx ops aren't hash-oracled) --

  private def minhashTop(s: SparkSession, dir: String): DataFrame =
    minhashCandidates(Tables.documents(s, dir))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .select(col("doc_a"), col("doc_b"), QueryDef.dec4(col("jaccard")).as("jaccard"))

  private def simhashTop(s: SparkSession, dir: String): DataFrame =
    simhashCandidates(Tables.documents(s, dir), maxHamming = 16)
      .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
      .limit(20)

  private def ngramTop(s: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(Tables.documents(s, dir))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(20)
      .select(col("doc_a"), col("doc_b"), col("shared"),
        QueryDef.dec4(col("jaccard")).as("jaccard"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("minhash_neardup_topk", minhashTop, None),
    QueryDef("simhash_neardup_topk", simhashTop, None),
    QueryDef("ngram_jaccard_topk", ngramTop, None))
}
