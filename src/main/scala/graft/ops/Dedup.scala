package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale corpus curation: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard. Designed so no step is
  * quadratic in corpus size — every candidate-pair generator goes through
  * an equi-join on a bucket key (LSH band / SimHash chunk), which Spark
  * executes as a shuffled hash join; only within-bucket pairs are ever
  * materialized. Skewed buckets (boilerplate shingles) are the known
  * hazard at 100 TB — cap them with `maxBucketSize`.
  */
object Dedup {

  /** Exact dedup by content hash: one row per distinct text, keeping the
    * smallest id as representative plus the duplicate count. Equivalent
    * to the reference's upsert identity semantics applied to content.
    */
  def exact(df: DataFrame, idCol: Column, text: Column): DataFrame =
    df.groupBy(sha2(text, 256).as("content_hash"))
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Lowercased whitespace-token k-shingles of a text column, distinct. */
  def shingles(text: Column, k: Int): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - k, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature of a shingle array: `numHashes` independent hash
    * families h_i(s) = xxhash64(i, s); signature element i is the min
    * over shingles. Pure expressions, no UDF.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    array((0 until numHashes).map(i =>
      array_min(transform(shingleArr, s => xxhash64(lit(i), s)))): _*)

  /** MinHash-LSH candidate pairs: signatures banded into `bands` groups
    * of `rowsPerBand`; docs sharing any band bucket become a candidate
    * pair; candidates are verified with exact shingle Jaccard and kept
    * when `jaccard >= threshold`. Output: (id_a, id_b, jaccard) with
    * id_a < id_b.
    *
    * Scale: the only join is on (band_idx, band_hash). `maxBucketSize`
    * drops degenerate buckets (e.g. empty-text shingles) whose within-
    * bucket blowup would otherwise dominate — standard LSH practice.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: Column,
      text: Column,
      shingleK: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    val base = df.select(idCol.as("id"), shingles(text, shingleK).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = base.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))): _*))
        .as(Seq("band_idx", "band_hash")))
    val pruned = banded
      .withColumn("__bucket_n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band_idx"), col("band_hash"))))
      .filter(col("__bucket_n") <= maxBucketSize)
    val a = pruned.select(col("band_idx"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = pruned.select(col("band_idx"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash of the token stream: bit b of the hash is set when
    * the sum over tokens of ±1 (sign of bit b of xxhash64(token)) is
    * positive. Computed as 64 conditional sums after an explode — one
    * shuffle on the doc id.
    */
  def simhash(df: DataFrame, idCol: Column, text: Column): DataFrame = {
    val toks = df.select(idCol.as("id"),
      explode(split(lower(trim(text)), "\\s+")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b"))
    val perDoc = toks.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)
    val hash = (0 until 64)
      .map(b => when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce(_.bitwiseOR(_))
    perDoc.select(col("id"), hash.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance <= maxHamming (< 16):
    * the 64-bit hash splits into 4 16-bit chunks; by pigeonhole any pair
    * within distance 3 shares at least one exact chunk, so candidates
    * come from 4 chunk-equality joins, then exact popcount verification.
    */
  def simhashPairs(
      sims: DataFrame /* columns: id, simhash */,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < 4, "pigeonhole blocking uses 4 chunks")
    val chunked = sims.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("chunk_idx", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard similarity for all pairs within a blocking key
    * (e.g. language or source) — the verification-grade dedup metric.
    * The blocking key bounds the pair blowup; at corpus scale pair it
    * with minhashLshPairs for candidate generation instead.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: Column,
      text: Column,
      blockCol: Column,
      n: Int = 3,
      threshold: Double = 0.3): DataFrame = {
    val base = df.select(idCol.as("id"), blockCol.as("blk"),
      shingles(text, n).as("sh"))
    val a = base.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
