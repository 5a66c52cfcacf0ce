package graft

import graft.pipeline.{Dedup, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 0
    (2L, "completely different words about spark catalyst optimizer plans"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (4L, "spark catalyst optimizer")
  ).toDF("doc_id", "text")

  test("exactGroups finds the exact duplicate pair") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    assert(g.length == 1)
    assert(g(0).getAs[Long]("n") == 2 && g(0).getAs[Long]("keeper") == 0L)
  }

  // exactDedup's CONTRACT under duplicate ids (r19, VERDICT #8 / r18
  // ADVICE): ids are declared unique per document — under that contract
  // the r18 min_by form and the pre-r18 keeper-join form are identical.
  // When a corpus VIOLATES it, the pinned guarantees are set-level: ONE
  // surviving row per distinct text, the survivor's id is the group's
  // MINIMUM non-null id, and its text is the group's text. Which of
  // several rows TYING on the minimal id survives is unspecified (the two
  // historical forms differ exactly there: the keeper join returned every
  // tied row, min_by returns one arbitrary tied row — one-per-digest is
  // the declared semantics, so min_by's shape is the contract).
  test("exactDedup with duplicate ids: one survivor per text, min non-null id") {
    val dup = Seq(
      (5L, "alpha text", "x1"), (5L, "alpha text", "x2"), // tied min ids
      (9L, "alpha text", "x3"),                           // larger id, same text
      (7L, "beta text", "y1"), (3L, "beta text", "y2"),   // distinct ids
      (2L, "gamma text", "z1")
    ).toDF("doc_id", "text", "tag")
    val kept = Dedup.exactDedup(dup, "text", "doc_id")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._2)
    assert(kept.length == 3) // exactly one per distinct text
    assert(kept.map(_._1).toSeq == Seq(5L, 3L, 2L)) // min id per group
    // null ids never survive and never mask a non-null keeper
    val withNull = Seq(
      (java.lang.Long.valueOf(1L), "t1"), (null.asInstanceOf[java.lang.Long], "t1"),
      (null.asInstanceOf[java.lang.Long], "t2")
    ).toDF("doc_id", "text")
    val kept2 = Dedup.exactDedup(withNull, "text", "doc_id")
      .collect().map(r => (r.get(0), r.getString(1)))
    assert(kept2.toSeq == Seq((1L, "t1"))) // all-null-id group contributes nothing
  }

  test("minhash signature of identical docs matches; est_jaccard 1.0") {
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id", minEstSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(p => (p._1, p._2))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L)
    assert(exact.isDefined && exact.get._3 == 1.0)
    // near-dup 0-1 should be caught with high estimate
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 >= 0.5))
    // unrelated docs never pair
    assert(!pairs.exists(p => p._2 == 2L || p._1 == 2L))
  }

  test("simhash: identical -> 0 hamming; near-dup small; unrelated far") {
    val sh = Dedup.simhashDf(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    val hamNear = java.lang.Long.bitCount(sh(0L) ^ sh(1L))
    val hamFar = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hamNear < hamFar)
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("minhash/simhash kernels are bit-identical to the exploded formulations") {
    // the sf0.001 documents table gives realistic text (punctuation, repeated
    // tokens, short docs); assert the per-row kernels reproduce the original
    // explode+aggregate pipelines hash-for-hash
    val real = graft.engine.Tables.read(spark, sfDir, "documents")
      .select($"doc_id", $"text")
      .unionByName(docs.select(($"doc_id" + 1000).as("doc_id"), $"text"))
    val (n, k) = (3, 16)
    val oldSig = {
      val sh = real
        .select($"doc_id".as("id"), explode(Dedup.shingles("text", n)).as("sh"))
        .select($"id", xxhash64($"sh").as("h"))
      val aggs = (0 until k).map(s => min(xxhash64($"h", lit(s))).as(s"m$s"))
      sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
        .select($"id", array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
    }
    val newSig = Dedup.minhashSignatures(real, "text", "doc_id", n, k)
    assert(newSig.join(oldSig, "id")
      .filter(newSig("sig") =!= oldSig("sig")).count() == 0)
    assert(newSig.count() == oldSig.count())

    val oldSim = {
      val tok = real.select($"doc_id".as("id"), explode(Dedup.tokens("text")).as("t"))
        .withColumn("h", xxhash64($"t"))
      val bitSums = (0 until 64).map { i =>
        sum(when(shiftright($"h", i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$i")
      }
      val agged = tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      val sim = (0 until 64)
        .map(i => when(col(s"b$i") >= 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _)
      agged.select($"id", sim.as("sh"))
    }
    val newSim = Dedup.simhashDf(real, "text", "doc_id")
    assert(newSim.join(oldSim, "id")
      .filter(newSim("sh") =!= oldSim("sh")).count() == 0)
    assert(newSim.count() == oldSim.count())
  }

  test("tokenJaccardPairs computes exact jaccard") {
    val pairs = Dedup.tokenJaccardPairs(docs, "text", "doc_id", minJaccard = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 3L)) == 1.0)
    // doc0 tokens: {the,quick,brown,fox,jumps,over,lazy,dog,near,river,bank} (11)
    // doc1 same but bend instead of bank: inter=10, union=12
    assert(math.abs(pairs((0L, 1L)) - 10.0 / 12.0) < 1e-12)
    assert(pairs((2L, 4L)) == 3.0 / 8.0)
  }

  test("fingerprint: identical docs share fp, different docs differ") {
    val fp = TextAnalysis.fingerprint(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(3L))
    assert(fp(0L) != fp(2L))
  }

  test("fingerprint md5 variant: same structure as xxhash64, portable hash") {
    // the md5 form (the oracle-checked registered variant) shares every
    // stage with the production xxhash64 form except the hash call:
    // identical docs still collide, shingle counts are identical, and the
    // short-doc fallback hashes the whole text (one shingle) — the branch
    // the sf0.01 oracle can't reach (no <4-token docs in the fixture)
    val md = TextAnalysis.fingerprint(docs, "text", "doc_id", hash = "md5").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val mdMap = md.map(t => t._1 -> t._2).toMap
    assert(mdMap(0L) == mdMap(3L) && mdMap(0L) != mdMap(2L))
    val nx = TextAnalysis.fingerprint(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    md.foreach { case (id, _, n) => assert(nx(id) == n) }
    val short = Seq((1L, "two words"), (2L, "a b c d e")).toDF("doc_id", "text")
    val sfp = TextAnalysis.fingerprint(short, "text", "doc_id", hash = "md5").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(sfp(1L)._2 == 1)
    assert(sfp(1L)._1 == java.security.MessageDigest.getInstance("MD5")
      .digest("two words".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(sfp(2L)._2 == 2) // 5 tokens -> 2 distinct 4-gram shingles
    intercept[IllegalArgumentException](
      TextAnalysis.fingerprint(short, "text", "doc_id", hash = "sha1"))
  }

  test("langId votes stopwords; quality metrics sane") {
    val lang = Seq((1L, "the cat of the house is in it"), (2L, "el gato de la casa es un gato"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(lang, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))

    val q = TextAnalysis.quality(docs, "text", "doc_id")
      .filter($"doc_id" === 4L).collect()(0)
    assert(q.getAs[Int]("n_tokens") == 3)
    assert(q.getAs[Double]("uniq_ratio") == 1.0)
  }

  test("cosine similarity: self-similarity is 1, orthogonal is 0") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getAs[Long]("c_id"), r.getAs[Double]("cos"), r.getAs[Int]("rk")))
    assert(top.toSeq == Seq((2L, 1.0, 1), (3L, 0.7071, 2), (1L, 0.0, 3)))
  }

  test("ivf ANN recall against brute force on real embeddings") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5,
        nLists = 8, nProbe = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"ivf recall $recall too low")
  }

  test("ivf centroids: draining cluster keeps its seed, others keep refined means") {
    // vectors 0 and 1 are identical, so seed 1's would-be members all tie to
    // cluster 0 (struct (d, cid) min is lexicographic: ties go to lower cid)
    // and cluster 1 drains empty after the Lloyd step
    val vecs = Seq(
      (0L, Array(0.0, 0.0)), (1L, Array(0.0, 0.0)),
      (2L, Array(10.0, 10.0)), (3L, Array(10.0, 12.0)),
      (4L, Array(0.0, 2.0))
    ).toDF("c_id", "cv")
    val cents = Similarity.ivfCentroids(vecs, dim = 2, nLists = 4)
    assert(cents.length == 4)
    // cluster 0: members {0, 1, 4} -> refined mean (0, 2/3), not the seed
    assert(cents(0)(0) == 0.0 && math.abs(cents(0)(1) - 2.0 / 3.0) < 1e-12)
    // cluster 1 drained -> its seed survives (all-or-nothing would also have
    // thrown away clusters 0/2/3's refinements)
    assert(cents(1).toSeq == Seq(0.0, 0.0))
    // singleton clusters refine to themselves
    assert(cents(2).toSeq == Seq(10.0, 10.0) && cents(3).toSeq == Seq(10.0, 12.0))
  }

  test("pq ANN recall against brute force on real embeddings") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 5,
        m = 8, kCodes = 16)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    // 0.733 measured at the default auto-rerank pool (12*k); bar at 0.6
    // keeps margin without tracking the exact value
    assert(recall >= 0.6, s"pq recall $recall too low")
  }

  test("semanticPairs: nLists=1 equals the exact all-pairs baseline; clustered is a subset") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val exact = Dedup.embeddingDupsExact(e, "embedding", "vec_id", minCos = 0.45)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val one = Dedup.semanticPairs(e, "embedding", "vec_id", minCos = 0.45, nLists = 1)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(one == exact)
    val clustered = Dedup.semanticPairs(e, "embedding", "vec_id", minCos = 0.45, nLists = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // cluster restriction never invents a pair (precision 1), only misses
    // cross-cluster ones
    assert(clustered.subsetOf(exact))
    assert(clustered.nonEmpty)
  }

  test("semanticDedup: duplicate vectors collapse to one keeper") {
    // 0/1/2 mutually near-identical; 3 orthogonal -> components {0,1,2},{3}
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.01f)),
      (2L, Array(0.998f, 0.02f)), (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.semanticDedup(vecs, "embedding", "vec_id",
        minCos = 0.99, nLists = 1)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L))
  }

  test("ivf-pq ANN recall against brute force on real embeddings") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 5,
        nLists = 8, nProbe = 4, m = 8, kCodes = 16)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.5, s"ivf-pq recall $recall too low")
  }

  test("pq encoding reconstructs exact centroids: codebook vectors score cos 1") {
    // corpus = the centroid grid itself in 4 dims, m=2 subspaces of 2 dims:
    // every vector quantizes to itself, so the reconstruction is exact and
    // the query's true nearest neighbors come back in order
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.pqTopK(vecs, vecs.filter($"vec_id" === 0L),
        "vec_id", "embedding", k = 3, m = 2, kCodes = 4)
      .collect().map(r => (r.getAs[Long]("c_id"), r.getAs[Double]("cos"), r.getAs[Int]("rk")))
    // exact cosines: vec2 = (1,0,1,0) -> 1/sqrt(2)=0.7071; vec1,vec3 -> 0
    assert(top.toSeq == Seq((2L, 0.7071, 1), (1L, 0.0, 2), (3L, 0.0, 3)))
  }

  test("lsh ANN recall against brute force on real embeddings") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val q = e.filter($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, bits = 6, probes = 6)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ann).size.toDouble / bf.size
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("exactSubstringDedup drops later occurrences of a duplicated chunk and reassembles") {
    val d = Seq(
      (1L, "a b c d e f"),   // chunks of 3: "a b c", "d e f" — both first
      (2L, "a b c x y z"),   // "a b c" already seen in doc 1 -> dropped
      (3L, "x y z"),         // whole doc duplicates doc 2's second chunk
      (4L, "d e")            // short doc: one partial chunk, first occurrence
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstringDedup(d, "text", "doc_id", chunkTokens = 3)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "a b c d e f", 2L, 2L)))
    assert(out(1) == ((2L, "x y z", 2L, 1L)))
    assert(out(2) == ((3L, "", 1L, 0L)))
    assert(out(3) == ((4L, "d e", 1L, 1L)))
  }

  test("paragraphDedup: blank-line units, duplicated paragraph dropped corpus-wide") {
    val d = Seq(
      (1L, "intro text\n\nshared boilerplate\n\nbody one"),
      (2L, "shared boilerplate\n\nbody two"),   // boilerplate seen in doc 1
      (3L, "  \n\nbody one")                    // blank unit ignored; body one dups doc 1's
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(d, "text", "doc_id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out(0) == ((1L, "intro text\n\nshared boilerplate\n\nbody one", 3L, 3L)))
    assert(out(1) == ((2L, "body two", 2L, 1L)))
    assert(out(2) == ((3L, "", 1L, 0L)))
  }

  test("argmin-center kernel is bit-identical to the array_min(distances) formulation") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    graft.functions.GridDbScalarFunctions.register(spark)
    val c0 = e.select($"vec_id".as("c_id"), $"v".as("cv"))
    val cents = Similarity.ivfCentroids(c0, dim = 64, nLists = 8)
    val both = e.select($"vec_id",
        Similarity.assignCluster($"v", cents).as("kernel"),
        array_min(Similarity.distances($"v", cents)).getField("cid").as("interp"))
      .filter($"kernel" =!= $"interp" || $"kernel".isNull =!= $"interp".isNull)
    assert(both.count() == 0)
    // null vector stays null; dimension mismatch nulls out (self-excludes)
    val edge = Seq((1L, Some(Seq(0.1, 0.2))), (2L, None))
      .toDF("id", "v")
      .select($"id", Similarity.assignCluster($"v", cents).as("cl"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(edge == Map(1L -> true, 2L -> true))
  }

  test("fused SRP signature is bit-identical to the per-bit formulation") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
      .select($"vec_id", transform($"embedding", _.cast("double")).as("v"))
    graft.functions.GridDbScalarFunctions.register(spark)
    val dim = e.select(size($"v")).head().getInt(0)
    val planes = Similarity.hyperplanes(16, dim)
    val both = e.select($"vec_id",
        Similarity.signature($"v", planes).as("perBit"),
        Similarity.signatureFused($"v", 16, dim).as("fused"))
      .filter($"perBit" =!= $"fused")
    assert(both.count() == 0)
  }

  test("bm25: hand-computed two-doc fixture") {
    import graft.pipeline.Search
    val d = Seq((1L, "spark spark fast"), (2L, "slow join"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val got = Search.bm25(d, "text", "doc_id", Seq("spark"), k = 3)
      .as[(Long, Double)].collect()
    // only doc 1 matches; N=3, df=1, idf=ln(1+(3-1+0.5)/1.5)=ln(8/3)
    // tf=2, dl=3, avgdl=(3+2+3)/3; score=idf*2*2.2/(2+1.2*(.25+.75*3/avgdl))
    val avgdl = 8.0 / 3
    val exp = math.log(1 + 2.5 / 1.5) * 2 * 2.2 /
      (2 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    // operator rounds the score to 4 decimals (oracle-parity discipline)
    assert(got.length == 1 && got(0)._1 == 1L && math.abs(got(0)._2 - exp) < 1e-4)
  }

  test("tokenCounts: whitespace words vs BPE-ish pieces") {
    val d = Seq((1L, "hello world-42, ok!"), (2L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenCounts(d, "text", "doc_id").orderBy("doc_id")
      .as[(Long, Int, Int, Double)].collect()
    // pieces: hello | world | - | 42 | , | ok | !  (7); ws words: 3
    assert(got(0) == ((1L, 3, 7, 19.0 / 7)))
    assert(got(1) == ((2L, 0, 0, 0.0)))
  }

  test("maskPii masks email/ip/phone and counts them") {
    val d = Seq((1L, "mail a.b+c@x-corp.io, host 10.0.255.7, call +15551234567 now"),
      (2L, "no pii here 1.2.3 not-an-ip a@b bad")).toDF("doc_id", "text")
    val m = TextAnalysis.maskPii(d, "text", "doc_id").orderBy("doc_id")
      .as[(Long, String, Int, Int, Int)].collect()
    assert(m(0) == ((1L, "mail <EMAIL>, host <IP>, call <PHONE> now", 1, 1, 1)))
    // "a@b" has no dotted TLD, "1.2.3" only three octets -> untouched
    assert(m(1) == ((2L, "no pii here 1.2.3 not-an-ip a@b bad", 0, 0, 0)))
  }

  test("repetition metrics: hand-computed fixtures") {
    val d = Seq(
      // 6 tokens, 4 distinct -> dup_word 2/6; "a b" occurs 2x of 5 2-grams
      (1L, "a b a b c d"),
      // two identical lines of three
      (2L, "x y\nx y\nz w"),
      // all-unique, fewer than 5 tokens -> zero 5-gram denominator
      (3L, "p q r"),
      (4L, "")).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(d, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Double, Double, Double, Double, Double)].collect()
    // doc 1: tokens=6 distinct=4; 5-grams=2 distinct=2; top 2-gram "a b" x2,
    // chars covered 2*3=6 over "a b a b c d".length=11
    assert(m(0) == ((1L, 2.0 / 6, 0.0, 6.0 / 11, 0.0, 0.0)))
    // doc 2: lines = [x y, x y, z w]: dup 1/3; line chars 9, distinct 6
    // -> char frac (9-6)/9 = 1/3
    assert(m(1)._5 == 1.0 / 3 && m(1)._6 == 1.0 / 3)
    // doc 3: no dups; top 2-gram "p q" still covers 3 of 5 norm chars
    assert(m(2) == ((3L, 0.0, 0.0, 3.0 / 5, 0.0, 0.0)))
    // doc 4 (empty text): all zero, no div-by-zero
    assert(m(3) == ((4L, 0.0, 0.0, 0.0, 0.0, 0.0)))
  }

  test("connected components: chain collapses to one star at the min") {
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val cc = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("connected components: random graph matches driver union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val expected = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
    }
    val cc = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc == expected)
  }

  test("cluster assignment labels every doc; keepers are component minima") {
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    val pairs = Dedup.tokenJaccardPairs(d, "text", "doc_id", minJaccard = 0.8)
      .select($"a", $"b")
    val assign = Dedup.clusterAssign(d, "doc_id", pairs, "a", "b")
    assert(assign.count() == d.count())
    // cluster label is always <= member id (min-of-component convention)
    assert(assign.filter($"cluster" > $"id").count() == 0)
    // every edge connects two docs with the same cluster label
    val viol = pairs
      .join(assign.withColumnRenamed("id", "a").withColumnRenamed("cluster", "ca"), "a")
      .join(assign.withColumnRenamed("id", "b").withColumnRenamed("cluster", "cb"), "b")
      .filter($"ca" =!= $"cb")
    assert(viol.count() == 0)
  }

  test("tokenJaccardPairs verify stage: partitions derive from candidate volume") {
    // the sizing rule itself (pure): floor at the session default, then
    // candidates/target, capped
    assert(Dedup.verifyPartitions(0L, 32) == 32)
    assert(Dedup.verifyPartitions(25100000L, 32) == 503) // the SCALING.md 5M-doc OOM case
    assert(Dedup.verifyPartitions(1000L, 200) == 200)
    assert(Dedup.verifyPartitions(Long.MaxValue, 32, 50000L) == 65536)
    // byte-estimate variant: real scan statistics drive the width, and an
    // absurd per-partition budget caps at 65536 without Long wrap
    val dScan = graft.engine.Tables.read(spark, sfDir, "documents")
    assert(Dedup.widthFromBytes(dScan, 4, bytesPerPartition = 1L) == 65536)
    assert(Dedup.widthFromBytes(dScan, 4) == spark.sessionState.conf.numShufflePartitions)
    // end-to-end: a small per-partition target makes the sf0.001 corpus
    // (~62k candidates at j>=0.8) exceed the session default, so every
    // verify exchange must carry the DERIVED width — and the result must
    // be identical to the default-width plan
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    val nCand = Dedup.tokenJaccardCandidates(d, "text", "doc_id", 0.8).count()
    val default32 = spark.sessionState.conf.numShufflePartitions
    val expected = Dedup.verifyPartitions(nCand, default32, 500L)
    assert(expected > default32, s"probe corpus too small to exercise the adaptive path ($nCand cand)")
    val adaptive = Dedup.tokenJaccardPairs(d, "text", "doc_id", 0.8,
      targetCandidatesPerPartition = 500L)
    val rows = adaptive.orderBy("a", "b").collect()
    val plan = adaptive.queryExecution.executedPlan.toString
    assert(plan.contains(s" $expected), REPARTITION_BY_NUM"),
      s"verify exchanges not sized from candidate count (expected width $expected)\n$plan")
    val base = Dedup.tokenJaccardPairs(d, "text", "doc_id", 0.8)
      .orderBy("a", "b").collect()
    assert(rows.toSeq == base.toSeq, "adaptive width changed the verify result")
  }

  test("sketch-once invariant: LSH self-joins reuse one exchange, never broadcast") {
    // PLANS.md's core perf claim: the banded self-join's two legs share ONE
    // canonically-equal repartition Exchange, so the sketch kernel runs once
    // per row. The shuffle_hash hint pins it — without the pin the planner
    // may stack a BroadcastExchange on one leg, keeping BOTH sketch subtrees
    // live and silently doubling the sketching cost at scale.
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    def executedPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    for ((name, plan) <- Seq(
        "minhashCandidates" ->
          executedPlan(Dedup.minhashCandidates(d, "text", "doc_id", minEstSim = 0.5)),
        "simhashPairs" ->
          executedPlan(Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 3)),
        "embeddingCandidates" ->
          executedPlan(Dedup.embeddingCandidates(e, "embedding", "vec_id", minCos = 0.4)))) {
      assert(!plan.contains("BroadcastExchange"),
        s"$name: broadcast leg would duplicate the sketch subtree\n$plan")
      assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
          plan.contains("reuses"),
        s"$name: executed plan shows no exchange reuse — sketch runs twice\n$plan")
    }
  }

  test("exactSubstringDedup plan: no pair join, nothing quadratic") {
    // PLANS.md round-6 claim: chunk explode (map) -> ONE chunk-text window
    // shuffle -> ONE doc-id aggregate -> join back to the id list. Any
    // cartesian/nested-loop node would mean a pair-wise formulation crept in.
    val d = graft.engine.Tables.read(spark, sfDir, "documents")
    val df = Dedup.exactSubstringDedup(d, "text", "doc_id", chunkTokens = 20)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair-wise join in the substring-dedup plan\n$plan")
    assert(plan.contains("Window"), "occurrence ranking window missing")
  }

  test("autoBandBits: SRP band width grows with corpus, floored and per-band capped") {
    assert(Dedup.autoBandBits(100, 4) == 16)            // floor: 4 bits/band
    assert(Dedup.autoBandBits(2000, 4) == 20)           // 5 bits/band at 2k
    assert(Dedup.autoBandBits(20000, 4) == 36)          // 9 bits/band at 20k
    assert(Dedup.autoBandBits(20_000_000L, 4) == 76)    // 19 bits/band at 20M (sf100z)
    assert(Dedup.autoBandBits(100_000_000L, 4) == 84)   // 21 bits/band at 100M
    // width is PER BAND (each band hashes its own seeded plane set):
    // raising `bands` for recall no longer narrows every band — the
    // shared-63-bit-signature cap that froze 4-band growth at ~2M vectors
    // (and let buckets grow linearly with the corpus past it) is gone
    assert(Dedup.autoBandBits(100_000_000L, 8) == 168)  // still 21 bits/band
    for (bands <- 1 to 16; n <- Seq(1000L, 262_144L, 100_000_000L, Long.MaxValue))
      assert(Dedup.autoBandBits(n, bands) / bands <= 30,
        s"bands=$bands n=$n -> ${Dedup.autoBandBits(n, bands)} bits")
  }

  test("autoLists: AUTO nLists grows ~sqrt(N), floored at 16, capped at 4096") {
    assert(Similarity.autoLists(0) == 16)
    assert(Similarity.autoLists(100) == 16)
    assert(Similarity.autoLists(1_000_000) == 1000)
    assert(Similarity.autoLists(100_000_000L) == 4096)
    // behavioral: the default (-1) derives from the corpus count; explicit wins
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val n = e.count()
    assert(Similarity.resolveLists(e, -1) == Similarity.autoLists(n))
    assert(Similarity.resolveLists(e, -1) > 16 == (n > 256))
    assert(Similarity.resolveLists(e, 8) == 8)
  }

  test("embedding near-dup: LSH candidates subset of exact, with banded recall") {
    val e = graft.engine.Tables.read(spark, sfDir, "embeddings")
    val exact = Dedup.embeddingDupsExact(e, "embedding", "vec_id", minCos = 0.4)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // narrow 2-bit bands x 8 -> high collision probability at cos >= 0.4
    val cand = Dedup.embeddingCandidates(e, "embedding", "vec_id", minCos = 0.4,
        bits = 16, bands = 8)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // candidates are verified with the same exact cosine + threshold, so
    // precision is 1.0 by construction
    assert(cand.subsetOf(exact), s"non-dup pairs leaked: ${cand -- exact}")
    val recall = cand.size.toDouble / exact.size
    assert(recall >= 0.6, s"banded recall $recall too low (${cand.size}/${exact.size})")
  }
}
