package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale text deduplication operators for training-data pipelines.
  *
  * All operators are pure DataFrame transforms built from codegen'd
  * `functions._` higher-order functions — no Scala UDFs — so they stay
  * inside whole-stage codegen and scale to 100 TB via ordinary shuffles:
  *   - exact:    hash-groupBy on a content digest (1 shuffle)
  *   - minhash:  shingle → k minhashes → banded LSH bucket join (candidate
  *               generation is a self-equi-join on (band, bucket-hash), so
  *               only near-duplicates ever meet in a reducer)
  *   - simhash:  64-bit sign-of-projection sketch + banded hamming join
  *   - ngramJaccard: exact n-gram Jaccard verification for candidate pairs
  */
object Dedup {

  /** Exact duplicate groups by content digest (md5). */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))
      .filter(col("n") > 1)

  /** Word tokens, lowercased. */
  def tokens(textCol: String): Column = split(lower(col(textCol)), " ")

  /** Word n-gram shingles of `text` (falls back to the whole text when there
    * are fewer than n tokens). */
  def shingles(textCol: String, n: Int): Column = {
    val t = tokens(textCol)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** k-minhash signatures per document. Implemented as explode +
    * k `min(xxhash64(shingle, seed))` aggregates — a single codegen'd
    * hash-aggregate with map-side partials (the nested higher-order-function
    * formulation is interpreted row-at-a-time and recomputes the shingle
    * array per seed; ~20x slower). Output: (id, sig: array<long>[k]). */
  def minhashSignatures(docs: DataFrame, textCol: String, idCol: String,
                        shingleN: Int, k: Int): DataFrame = {
    // hash each shingle string ONCE, then derive the k-member hash family by
    // re-hashing the 8-byte value with a per-member salt (16x cheaper than
    // hashing the string per member)
    val sh = docs
      .select(col(idCol).as("id"), explode(shingles(textCol, shingleN)).as("sh"))
      .select(col("id"), xxhash64(col("sh")).as("h"))
    val aggs = (0 until k).map(s => min(xxhash64(col("h"), lit(s))).as(s"m$s"))
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash-LSH near-duplicate candidate pairs with estimated Jaccard.
    *
    * @param k     signature length (minhashes)
    * @param bands LSH bands (rows per band = k / bands); a pair collides in
    *              some band with prob 1-(1-j^r)^b for true Jaccard j.
    * @param minEstSim keep pairs whose signature-agreement >= this
    * Output: (a, b, est_jaccard), a < b. */
  def minhashCandidates(docs: DataFrame, textCol: String, idCol: String,
                        shingleN: Int = 3, k: Int = 16, bands: Int = 4,
                        minEstSim: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    // persisted: consumed by both sides of the candidate self-join;
    // released below once the candidate list is materialized
    val sig = minhashSignatures(docs, textCol, idCol, shingleN, k).persist()
    try {
      val bandCols = (0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until r).map(i => col("sig").getItem(b * r + i).cast("string")): _*))
      }
      val banded = sig.select(col("id"), col("sig"), posexplode(array(bandCols: _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val l = banded.select(col("band"), col("bucket"),
        col("id").as("a"), col("sig").as("sig_a"))
      val rgt = banded.select(col("band"), col("bucket"),
        col("id").as("b"), col("sig").as("sig_b"))
      // static-k agreement count: k comparisons summed inline stay in
      // whole-stage codegen (zip_with/filter HOFs are interpreted per pair)
      val agree = (0 until k)
        .map(i => (col("sig_a").getItem(i) === col("sig_b").getItem(i)).cast("int"))
        .reduce(_ + _)
      val out = l.join(rgt, Seq("band", "bucket")).filter(col("a") < col("b"))
        .select(col("a"), col("b"), (agree.cast("double") / k).as("est_jaccard"))
        .distinct()
        .filter(col("est_jaccard") >= minEstSim)
      // eager, lineage-truncating materialization (candidate list is tiny
      // next to the signature table) so the signature cache can be released
      // before returning — a long-lived session would otherwise leak it
      out.localCheckpoint(eager = true)
    } finally sig.unpersist(false)
  }

  /** 64-bit SimHash per document: sign of per-bit weighted sums of token
    * hashes. Implemented as explode + 64 literal-shift aggregates so the
    * whole computation is one codegen'd hash-aggregate. */
  def simhashDf(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"), explode(tokens(textCol)).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$i")
    }
    val agged = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 64)
      .map(i => when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agged.select(col("id"), sim.as("sh"))
  }

  /** SimHash near-duplicate pairs within `maxHamming` bits, found via banded
    * LSH on 16-bit chunks (a pair within hamming d<=3 of 64 bits must agree
    * exactly on at least one of the 4 chunks). Output (a, b, hamming). */
  def simhashPairs(docs: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhashDf(docs, textCol, idCol)
    val chunks = (0 until 4).map(b =>
      shiftright(col("sh"), b * 16).bitwiseAND(0xffffL))
    val banded = sh.select(col("id"), col("sh"), posexplode(array(chunks: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val l = banded.select(col("band"), col("chunk"), col("id").as("a"), col("sh").as("sh_a"))
    val rgt = banded.select(col("band"), col("chunk"), col("id").as("b"), col("sh").as("sh_b"))
    l.join(rgt, Seq("band", "chunk")).filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact token-set Jaccard similarity for all pairs sharing >= 1 token.
    * (Candidate generation by inverted index join; exact verify by count.) */
  def tokenJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        minJaccard: Double): DataFrame = {
    val tok = docs.select(col(idCol).as("id"), explode(array_distinct(tokens(textCol))).as("w"))
      .distinct()
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = tok.select(col("id").as("a"), col("w"))
      .join(tok.select(col("id").as("b"), col("w")), "w")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("id").as("b"), col("sz").as("szb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("sza") + col("szb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
