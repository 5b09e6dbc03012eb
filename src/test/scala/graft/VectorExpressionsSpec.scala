package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** The native vector expressions are drop-in replacements for the HOF
  * pipelines they speed up: every case here pins bit-identical
  * equivalence (same values, same NULL semantics) between
  * vec_ldot/vec_lnorm2/vec_fdot and the zip_with+aggregate
  * formulation, on both the codegen and interpreted paths.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random long vectors: negatives, zeros, and
  // magnitudes up to quantized-embedding scale (|q| <= 10000)
  private def lvecs: Seq[(Long, Array[Long])] =
    (0L until 50L).map { id =>
      id -> Array.tabulate(64) { j =>
        val h = (id * 1315423911L + j * 2654435761L) % 20001L
        h - 10000L
      }
    }

  test("vec_ldot is bit-identical to the zip_with+aggregate HOF") {
    val df = lvecs.toDF("id", "v").cache()
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter($"a.id" < $"b.id")
      .select(
        call_function("vec_ldot", $"a.v", $"b.v").as("native"),
        SimilarityOps.qdotHof($"a.v", $"b.v").as("hof"))
    assert(pairs.filter($"native" =!= $"hof" ||
      $"native".isNull =!= $"hof".isNull).count() === 0)
    assert(pairs.count() === 50 * 49 / 2)
  }

  test("vec_lnorm2 equals vec_ldot(v, v)") {
    val df = lvecs.toDF("id", "v")
    val bad = df.select(
      call_function("vec_lnorm2", $"v").as("n2"),
      call_function("vec_ldot", $"v", $"v").as("dot"))
      .filter($"n2" =!= $"dot")
    assert(bad.count() === 0)
  }

  test("NULL semantics match the HOF: null array, length mismatch, null element") {
    val df = Seq(
      (1L, Some(Array[Long](1, 2, 3)), Some(Array[Long](4, 5, 6))),
      (2L, None, Some(Array[Long](4, 5, 6))),
      (3L, Some(Array[Long](1, 2)), Some(Array[Long](4, 5, 6)))
    ).toDF("id", "a", "b")
      // row 4: null ELEMENT (built via SQL to get array<bigint> with null)
      .union(spark.sql(
        "SELECT 4L AS id, array(1L, CAST(NULL AS BIGINT)) AS a, array(7L, 8L) AS b"))
    val got = df.select($"id",
      call_function("vec_ldot", $"a", $"b").as("native"),
      SimilarityOps.qdotHof($"a", $"b").as("hof"))
      .orderBy("id").collect()
    got.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"row ${r.getLong(0)}")
      if (!r.isNullAt(1)) assert(r.getLong(1) === r.getLong(2))
    }
    // and the expected concrete values
    assert(got.map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq
      === Seq(32L, null, null, null))
  }

  test("vec_fdot matches the double-cast HOF on float embeddings") {
    val df = Seq(
      (0L, Array(1.0f, 0.5f, -0.25f, 0.125f)),
      (1L, Array(0.9f, -0.45f, 0.0f, 0.09f)),
      (2L, Array(0.1f, 0.2f, 0.3f, -0.4f))
    ).toDF("id", "v")
    val hof = aggregate(
      zip_with($"a.v", $"b.v", (x, y) => x.cast("double") * y.cast("double")),
      lit(0d), (acc, p) => acc + p)
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(call_function("vec_fdot", $"a.v", $"b.v").as("native"), hof.as("hof"))
      .collect()
    pairs.foreach { case Row(n: Double, h: Double) => assert(n === h) }
  }

  test("interpreted (no-codegen) path agrees with codegen") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    val df = lvecs.take(10).toDF("id", "v")
    def run(): Seq[Long] = df.as("a").crossJoin(df.as("b"))
      .select(call_function("vec_ldot", $"a.v", $"b.v").as("d"))
      .orderBy("d").as[Long].collect().toSeq
    val withCodegen = run()
    try {
      spark.conf.set(key, "NO_CODEGEN")
      assert(run() === withCodegen)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("optimizer rule rewrites vec_ldot(x, x) to vec_lnorm2(x)") {
    // a file-backed plan — local/literal self-dots constant-fold away
    // before the rule's effect is observable
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(SimilarityOps.quantize(col("embedding")).as("qv"))
    val df = embs.select(call_function("vec_ldot", $"qv", $"qv").as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("vec_lnorm2"),
      s"self-dot not rewritten:\n${df.queryExecution.optimizedPlan}")
    // and it still computes the same value as the unfused form
    val fused = df.orderBy("d").as[Long].head()
    val manual = embs.select(SimilarityOps.qdotHof($"qv", $"qv").as("d"))
      .orderBy("d").as[Long].head()
    assert(fused === manual)
    // non-identical children stay a dot product
    val keep = embs.select(call_function("vec_ldot", $"qv",
      org.apache.spark.sql.functions.reverse($"qv")).as("d"))
    assert(keep.queryExecution.optimizedPlan.toString.contains("vec_ldot"))
  }

  test("extensions route: functions resolve in plain SQL") {
    val r = spark.sql(
      """SELECT vec_ldot(array(1L,2L,3L), array(4L,5L,6L)) AS d,
        |       vec_lnorm2(array(3L,4L)) AS n2,
        |       vec_fdot(array(CAST(0.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS f
        |""".stripMargin).head()
    assert(r.getLong(0) === 32L)
    assert(r.getLong(1) === 25L)
    assert(r.getDouble(2) === 1.0d)
  }

  test("bucketedPairs is ONE shuffle with in-task pair generation (r17 plan pin)") {
    // r17 rewrote the operator: the r16 shape paid 4 job floors
    // (bucket census agg + cap semi-join + broadcast build +
    // self-join with the codegen vec_ldot); pairs now generate inside
    // the task after a single bucket repartition, with the dot
    // product in plain JVM loops (same exact-integer arithmetic).
    // Pin the contract: exactly ONE exchange (the bucket
    // repartition), a MapPartitions pair generator, and NO broadcast
    // or join operators anywhere in the final plan.
    val embs = Seq(
      (0L, Array(1.0f, 0.5f, 0.0f, 0.1f)),
      (1L, Array(0.9f, 0.45f, 0.0f, 0.09f)),
      (2L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.bucketedPairs(embs, "vec_id", "embedding", 4, Long.MinValue)
    assert(pairs.collect().length === 1) // vectors 0,1 share the sign bucket
    val whole = pairs.queryExecution.executedPlan.toString
    val s = whole.split("== Initial Plan ==")(0) // final plan only
    assert(s.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1,
      s"expected exactly one exchange:\n$s")
    assert(s.contains("MapPartitions"), s"pair generator missing:\n$s")
    assert(!s.contains("BroadcastExchange") && !s.contains("Join"),
      s"join-shaped plan crept back:\n$s")
  }
}
