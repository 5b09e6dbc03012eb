package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy vectors: id 0 is the query; 1 is parallel to it, 2
  // orthogonal-ish, 3 anti-parallel.
  private def embs = Seq(
    (0L, Array(1.0f, 0.5f, 0.0f, 0.1f)),
    (1L, Array(0.9f, 0.45f, 0.0f, 0.09f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, -0.5f, 0.0f, -0.1f))
  ).toDF("vec_id", "embedding")

  test("quantize floors to exact integer ticks") {
    val q = Seq(Array(0.00015f, -0.00015f)).toDF("v")
      .select(SimilarityOps.quantize($"v").as("q"))
      .as[Array[Long]].head()
    assert(q === Array(1L, -2L)) // floor semantics, not round
  }

  test("bruteForceTopK ranks the parallel vector first, anti last") {
    val got = SimilarityOps.bruteForceTopK(embs, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect()
    assert(got === Array(1L, 2L, 3L))
  }

  test("qdot matches a hand-computed quantized dot product") {
    // q(1.0)=10000, q(0.5)=5000, q(0.0)=0, q(0.1)=999 or 1000 (float repr)
    val dot = SimilarityOps.scoreAgainstQuery(embs, "vec_id", "embedding", 0L)
      .filter($"vec_id" === 2L).select("dot").as[Long].head()
    assert(dot === 0L)
  }

  test("signBucket packs sign bits of leading dims") {
    val b = embs.select($"vec_id", SimilarityOps.signBucket($"embedding", 4).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) === (1 | 2 | 8)) // dims 1,2,4 positive; dim 3 is 0.0
    assert(b(3L) === 0L)
  }

  test("annSignBucketTopK only scores the query's bucket") {
    val got = SimilarityOps.annSignBucketTopK(embs, "vec_id", "embedding", 0L, 4, 10)
      .select("vec_id").as[Long].collect()
    assert(got === Array(1L)) // only vec 1 shares bucket 11
  }

  test("bucketedPairs joins within buckets only") {
    val pairs = SimilarityOps.bucketedPairs(embs, "vec_id", "embedding", 4, Long.MinValue)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L))) // 2 and 3 sit in singleton buckets
  }

  test("cosinePairs keeps high-cosine pairs and rejects low-cosine ones") {
    // v1 ∥ v2 (cos=1), v3 nearly orthogonal to both but same sign bucket
    val vecs = Seq(
      (1L, Array(0.5f, 0.5f, 0.01f, 0.01f)),
      (2L, Array(0.25f, 0.25f, 0.005f, 0.005f)),
      (3L, Array(0.01f, 0.01f, 0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.cosinePairs(vecs, "vec_id", "embedding",
      bits = 4, cosNum = 4, cosDen = 5)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("ivfAssign maps each vector to its max-dot centroid") {
    // centroids 0 and 2: vec 1 is parallel to 0 (positive dot, zero vs
    // centroid 2); vec 3 is anti-parallel to 0 (negative dot) so its
    // best list is centroid 2 (dot 0)
    val got = SimilarityOps.ivfAssign(embs, "vec_id", "embedding", Seq(0L, 2L))
      .select("vec_id", "cluster").as[(Long, Long)].collect().toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 2L))
  }

  test("ivfAssign breaks dot ties to the smallest centroid id") {
    // a vector orthogonal to BOTH centroids scores dot=0 against each
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (9L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.ivfAssign(vecs, "vec_id", "embedding", Seq(0L, 5L))
      .filter($"vec_id" === 9L).select("cluster").as[Long].head()
    assert(got === 0L)
  }

  test("ivfTopK probing every list reproduces the brute-force ranking") {
    val brute = SimilarityOps.bruteForceTopK(embs, "vec_id", "embedding", 0L, 3)
      .select("vec_id").as[Long].collect().toSeq
    val ivf = SimilarityOps.ivfTopK(embs, "vec_id", "embedding", 0L,
      centroidIds = Seq(0L, 2L), nprobe = 2, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf === brute)
  }

  test("ivfCentroidStep sums quantized components per (cluster, dim)") {
    val got = SimilarityOps.ivfCentroidStep(embs, "vec_id", "embedding", Seq(0L, 2L))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // cluster 0 holds vecs 0 and 1: dim0 q-sum = 10000 + 8999
    // (q(0.9f) floors to 8999 — float 0.9 is 0.8999999761… as double)
    assert(got((0L, 0)) === ((18999L, 2L)))
    // cluster 2 holds vecs 2 and 3: dim0 q-sum = 0 + (-10000)
    assert(got((2L, 0)) === ((-10000L, 2L)))
    assert(got.keys.map(_._2).max === 3) // all 4 dims present
  }

  test("ivfLloydReassign: stable toy clustering keeps its membership") {
    // centroids 0 and 2; means of {v0,v1} and {v2,v3} stay closest to
    // their own members, so one Lloyd step preserves the partition
    val got = SimilarityOps.ivfLloydReassign(embs, "vec_id", "embedding", Seq(0L, 2L))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 2L -> 2L))
  }

  test("ivfTopK with nprobe=1 searches only the nearest inverted list") {
    // query 0's nearest centroid is itself; only vec 1 shares that list
    val ivf = SimilarityOps.ivfTopK(embs, "vec_id", "embedding", 0L,
      centroidIds = Seq(0L, 2L), nprobe = 1, k = 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf === Seq(1L))
  }

  test("bucketedPairs drops over-cap buckets (ReLU-style skew guard)") {
    // 50 identical all-positive vectors collapse into one sign bucket;
    // with maxBucket=10 the bucket is dropped — zero pairs, not 50*49/2.
    val skewed = (1L to 50L).map(i => (i, Array(1.0f, 1.0f, 1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val n = SimilarityOps.bucketedPairs(skewed, "vec_id", "embedding",
      bits = 4, minDot = Long.MinValue, maxBucket = 10).count()
    assert(n === 0L)
  }

  test("quantizeInt8: exact codes, saturation, grid error; zero vector guarded") {
    val vs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(vs, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Int](2), r.getLong(3), r.getLong(4)))).toMap
    // grid (5000, -10000, 2500), scale 10000: codes 64/-127/32, one
    // saturated; worst grid error |5000 - 64*10000/127| = 39.370...
    assert(got(1L) === ((10000L, Seq(64, -127, 32), 1L, 39370L)))
    // all-zero vector: scale floors at 1, codes 0, zero error
    assert(got(2L) === ((1L, Seq(0, 0, 0), 0L, 0L)))
  }

  test("semanticDedup: keep-first within clusters, cross-cluster twins untouched") {
    // centroids 0 (x-ish) and 2 (z-ish): 1 and 3 land in 0's cluster
    // (3 is ANTI-parallel: dot<0 -> never a duplicate); 4 is a near
    // twin of 1 in the same cluster -> dropped against min id 0;
    // 5 is a twin of 2 in the OTHER cluster -> dropped against 2,
    // not against anything in cluster 0
    val docs = Seq(
      (0L, Array(1.0f, 0.5f, 0.0f, 0.1f)),
      (1L, Array(0.9f, 0.45f, 0.0f, 0.09f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, -0.5f, 0.0f, -0.1f)),
      (4L, Array(0.95f, 0.47f, 0.0f, 0.1f)),
      (5L, Array(0.0f, 0.01f, 0.99f, 0.0f))
    ).toDF("vec_id", "embedding")
    // tau^2 = 81/100 (cos >= 0.9)
    val got = SimilarityOps.semanticDedup(docs, "vec_id", "embedding",
      Seq(0L, 2L), tau2Num = 81, tau2Den = 100)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.get(2)), r.getBoolean(3))))
      .toMap
    assert(got(0L) === ((0L, None, true)))            // min id keeps
    assert(got(1L) === ((0L, Some(0L), false)))       // dup of 0
    assert(got(4L) === ((0L, Some(0L), false)))       // dup of 0, not 1
    assert(got(3L)._3 === true)                       // anti-parallel survives
    assert(got(2L) === ((2L, None, true)))
    assert(got(5L) === ((2L, Some(2L), false)))       // same-cluster only
  }

  test("semanticDedup cluster cap: skewed cluster sub-buckets, recall-only loss; strict mode raises") {
    // one cluster holds ~90% of the vectors (every vector near the
    // x-axis centroid 0); centroid 100 catches the rest. Near-dup
    // groups: ids 0..39 are all mutual near-twins of each other.
    val skewed = (0L until 40L).map { i =>
      (i, Array(1.0f, 0.001f * i, 0.0f, 0.0f))
    } ++ Seq(
      (100L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (101L, Array(0.0f, 0.01f, 0.99f, 0.0f)),
      (102L, Array(0.0f, 0.02f, 0.98f, 0.0f)),
      (103L, Array(0.0f, 0.03f, 0.97f, 0.0f)))
    val docs = skewed.toDF("vec_id", "embedding")
    def run(cap: Int) = SimilarityOps.semanticDedup(docs, "vec_id",
      "embedding", Seq(0L, 100L), tau2Num = 81, tau2Den = 100,
      maxCluster = cap)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getBoolean(3))))
      .toMap
    val exact = run(1000000) // cap never engages
    val capped = run(8)      // 40-vector cluster → ≥5 sub-buckets
    // exact: everything in cluster 0 except id 0 is a dup of 0
    assert(exact(0L) === ((None, true)))
    assert((1L until 40L).forall(i => exact(i) === ((Some(0L), false))))
    // capped: recall-only loss — every capped dup is a real dup (its
    // dup_of is a smaller id in the same near-dup group), and every
    // capped keep that exact dropped is purely a split-group miss
    capped.foreach { case (id, (dupOf, keep)) =>
      assert(keep === dupOf.isEmpty)
      dupOf.foreach { d =>
        assert(d < id, s"dup_of $d not smaller than $id")
        assert(exact(id)._2 === false,
          s"capped marked $id dup but exact kept it")
      }
    }
    // the cap engaged: the skewed cluster kept MORE than exact's 1
    val keptInBig = capped.count { case (id, (_, keep)) => id < 40L && keep }
    assert(keptInBig > 1 && keptInBig < 40,
      s"expected sub-bucketed partial dedup, got $keptInBig keeps")
    // strict mode: an over-cap cluster is a loud failure, not thinning
    val e = intercept[Exception] {
      SimilarityOps.semanticDedup(docs, "vec_id", "embedding",
        Seq(0L, 100L), tau2Num = 81, tau2Den = 100,
        maxCluster = 8, overCapIsError = true).collect()
    }
    assert(e.getMessage.contains("sub-bucketing cap"))
    // under-cap clusters are untouched by the gate
    assert(run(64) === exact)
  }

  test("typed int8 quantization is bit-identical to the expression form") {
    val embs = graft.Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2), r.getLong(3), r.getLong(4))
    val typed = SimilarityOps.quantizeInt8(embs, "vec_id", "embedding")
      .collect().map(key).toSet
    val expr = SimilarityOps.quantizeInt8Expr(embs, "vec_id", "embedding")
      .collect().map(key).toSet
    assert(typed === expr)
  }
}
