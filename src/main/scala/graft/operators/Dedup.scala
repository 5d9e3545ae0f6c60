package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, in increasing
  * sophistication: exact (hash group-by), fingerprint (bag-of-words),
  * n-gram Jaccard (exact set similarity), MinHash+LSH (approximate, the
  * 100 TB-scale path), and SimHash (bitwise near-dup signature).
  *
  * Scale notes:
  *   - exact/fingerprint dedup is one hash-aggregate shuffle on the digest —
  *     the digest (16 bytes) is the shuffle key, never the document body.
  *   - exact Jaccard self-joins on shared shingles; fine for verification,
  *     quadratic in the worst case — at scale it runs ONLY on LSH candidate
  *     pairs (candidateJaccardPairs), never all-pairs.
  *   - MinHash: shingle hashes are computed once (one xxhash64 per shingle),
  *     then k affine permutations run over the precomputed hash array —
  *     O(shingles + k·shingles) cheap long ops per doc, no re-hashing.
  *     LSH bands shuffle (band_id, band_hash) pairs, i.e. k longs per doc.
  */
object Dedup {

  /** Exact-duplicate groups by content digest: digest → (canonical id,
    * member count). One shuffle on the 128-bit digest. */
  def exactDupGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("digest"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_docs"))

  /** Keep-first dedup: one survivor per key set, earliest by the ordering
    * columns. The streaming-era "exact dedup" shape (row_number = 1). */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Word n-gram shingles (distinct), the unit of near-dup similarity.
    * A doc with fewer than n tokens has no shingles (empty array — the
    * sequence() guard matters: Spark infers step -1 for start > stop). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast(ArrayType(StringType)))
      .otherwise(array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
  }

  /** Exact pairwise Jaccard over shingle sets, via explode + self-join on
    * shared shingles — |A∩B| from the join, |A| and |B| from per-doc counts.
    * Only emits pairs above `threshold`. */
  def jaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    // materialize the shingle explosion once: it feeds BOTH sides of the
    // self-join plus the size aggregate, and higher-order shingle exprs are
    // interpreted (no codegen) — recomputing them 3× dominates runtime.
    // The cached set is (doc id, shingle) — tiny relative to the corpus.
    val sh = docs.select(col(idCol).as("doc"), explode(shingles(col(textCol), n)).as("s"))
      .cache()
    val sz = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("da"), col("y.doc").as("db"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("sa"), col("da") === col("sa.doc"))
      .join(sz.as("sb"), col("db") === col("sb.doc"))
      .select(col("da"), col("db"), col("inter"),
        (col("inter").cast(DoubleType) /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signature of length k over the shingle array.
    *
    * Each shingle string is hashed ONCE (xxhash64); the k "permutations"
    * re-hash that fixed-width long together with the permutation index —
    * much cheaper than re-hashing the string k times, fully independent,
    * and free of the long-overflow ANSI errors an affine (a·h+b) map hits
    * under Spark 4's default ANSI mode.
    *
    * IMPORTANT: only use this Column form when `shingleHashes` is already a
    * bound attribute. If the shingle expression is inlined here, the outer
    * per-permutation lambda re-evaluates the whole shingle build (split +
    * concat + O(n²) interpreted array_distinct) k times per row — use
    * `minhashSignatures` (the staged DataFrame form) instead. */
  def minhashSignature(shingleHashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingleHashes, h => xxhash64(i, h))))

  /** Staged signature computation: shingle build + base hash materialize
    * ONCE per doc (cache barrier — project-collapse would otherwise inline
    * them into the k-permutation lambda), then the k-min pass runs over the
    * bound hash array. Output: (doc, sig array<long>[k]). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int): DataFrame = {
    val hashed = docs.select(col(idCol).as("doc"),
        transform(shingles(col(textCol), n), s => xxhash64(s)).as("shh"))
      .cache()
    hashed.select(col("doc"), minhashSignature(col("shh"), k).as("sig"))
  }

  /** LSH band keys: the signature split into `bands` rows of `rowsPerBand`,
    * each band hashed to one long. Docs sharing any band key are candidate
    * pairs. banding: with b bands of r rows, a pair with Jaccard j collides
    * with probability 1-(1-j^r)^b — 16×4 catches j≥0.8 with p>0.999. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(b, slice(signature, b * rowsPerBand + 1, lit(rowsPerBand))))

  /** Candidate pairs from LSH bucket collisions: explode band keys, shuffle
    * on (band index implicit in key, band hash), pair up within buckets.
    * Output is distinct (da < db) pairs — the ONLY pairs that ever see an
    * exact-Jaccard verification at scale. */
  def lshCandidatePairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    // cache the banded signatures: the bucket self-join would otherwise
    // recompute them for both sides. Cached size = bands longs per doc.
    val sig = minhashSignatures(docs, textCol, idCol, n, k)
    val banded = sig.select(col("doc"),
      posexplode(lshBandKeys(col("sig"), bands, rowsPerBand)).as(Seq("band", "bh")))
      .cache()
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("da"), col("y.doc").as("db"))
      .distinct()
  }

  /** MinHash-LSH near-dup detection, end to end: LSH candidates, then exact
    * Jaccard verification restricted to those candidates. At 100 TB the
    * candidate set is orders of magnitude smaller than all-pairs. */
  def minhashDupPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, bands: Int, threshold: Double): DataFrame = {
    val cand = lshCandidatePairs(docs, textCol, idCol, n, k, bands)
    val sh = docs.select(col(idCol).as("doc"), explode(shingles(col(textCol), n)).as("s"))
      .cache()
    val sz = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    // intersection counted only for candidate pairs: join shingles through cand
    val inter = cand
      .join(sh.as("x"), col("da") === col("x.doc"))
      .join(sh.as("y"), col("db") === col("y.doc") && col("x.s") === col("y.s"))
      .groupBy("da", "db").agg(count(lit(1)).as("inter"))
    inter
      .join(sz.as("sa"), col("da") === col("sa.doc"))
      .join(sz.as("sb"), col("db") === col("sb.doc"))
      .select(col("da"), col("db"), col("inter"),
        (col("inter").cast(DoubleType) /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Oracle-reproducible SimHash via explode + one hash-aggregate: tokens
    * explode (narrow), each token hashed to 60 bits of its md5 (a hash both
    * this engine and any SQL oracle can compute), then ONE shuffle on the
    * doc id aggregates the 60 per-bit ±1 sums with map-side partial
    * aggregation — the scale shape for cross-record signatures, and fully
    * codegen'd (no interpreted HOF lambdas, unlike [[simhash64]]).
    * Output: (doc, simhash long with `bits` significant bits). */
  def simhashAgg(docs: DataFrame, textCol: String, idCol: String,
      bits: Int = 60): DataFrame = {
    require(bits <= 60, "15 md5 hex chars = 60 hash bits available")
    val hashed = docs
      .select(col(idCol).as("doc"), explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc"),
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast(LongType).as("th"))
    val bitSums = (0 until bits).map(b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$b"))
    val sig = (0 until bits)
      .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    hashed.groupBy(col("doc")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc"), sig.as("simhash"))
  }

  /** 64-bit SimHash over tokens: per bit position, sum ±1 weighted by each
    * token-hash's bit, take the sign. Hamming-close simhashes ⇒ similar
    * token distributions. Pure HOF arithmetic, no UDF. */
  def simhash64(text: Column): Column = {
    // shiftright/shiftleft in the Scala DSL take a literal Int shift; the
    // shift here is the lambda-bound bit index, so go through the SQL
    // function form (column-typed shift) via call_function.
    def shr(v: Column, bits: Column): Column = call_function("shiftright", v, bits)
    def shl(v: Column, bits: Column): Column = call_function("shiftleft", v, bits)
    val tokHashes = transform(split(text, " "), t => xxhash64(t))
    val bitSums = aggregate(
      tokHashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, i) => a + when(shr(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, i) => when(s > 0, shl(lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
