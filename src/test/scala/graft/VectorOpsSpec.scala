package graft

import org.apache.spark.sql.functions._

/** Property tests for the no-oracle vector operators. */
class VectorOpsSpec extends SparkSpecBase {

  test("ann lsh: exact duplicates always collide and rank first") {
    import spark.implicits._
    // corpus with each query vector duplicated under id+100000:
    // identical vectors land in identical buckets in every table, so the
    // duplicate MUST be retrieved, with cosine 1.0 at rank 1
    val e = operators.VectorOps.withNorm(spark, sfDir)
    val dup = e.filter($"vec_id" < 20)
      .withColumn("vec_id", $"vec_id" + 100000L)
    val corpus = e.unionByName(dup)
    val res = operators.VectorOps.annLshTopK(corpus, nQueries = 20, k = 3)
      .select($"q_id", $"vec_id", $"cos", $"rn")
      .as[(Long, Long, Double, Int)].collect()
    for (q <- 0L until 20L) {
      val top = res.filter(r => r._1 == q && r._4 == 1)
      assert(top.nonEmpty, s"query $q retrieved nothing")
      assert(top.head._2 == q + 100000L && top.head._3 == 1.0,
        s"query $q top-1 is ${top.head} not its exact duplicate")
    }
  }

  test("ann lsh results are exact within candidate buckets (re-rank correctness)") {
    import spark.implicits._
    val res = operators.VectorOps.vecAnnLsh.fn(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect()
    // ranks are 1..k dense per query and cosine non-increasing
    res.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length),
        s"ranks not dense for query $q")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3
        case _ => true
      }, s"cosine not monotone for query $q")
    }
  }

  test("ann ivf: exact duplicates land in the query's probed cell and rank first") {
    import spark.implicits._
    val e = operators.VectorOps.withNorm(spark, sfDir)
    val dup = e.filter($"vec_id" < 20)
      .withColumn("vec_id", $"vec_id" + 100000L)
    val corpus = e.unionByName(dup)
    val res = operators.VectorOps.annIvfTopK(corpus, nQueries = 20, k = 3, nprobe = 3)
      .select($"q_id", $"vec_id", $"cos", $"rn")
      .as[(Long, Long, Double, Int)].collect()
    for (q <- 0L until 20L) {
      val top = res.filter(r => r._1 == q && r._4 == 1)
      assert(top.nonEmpty, s"query $q retrieved nothing")
      assert(top.head._2 == q + 100000L && top.head._3 == 1.0,
        s"query $q top-1 is ${top.head} not its exact duplicate")
    }
  }

  test("ann ivf recall@3 vs brute-force ground truth") {
    import spark.implicits._
    val ivf = operators.VectorOps.vecAnnIvf.fn(spark, sfDir)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val e = operators.VectorOps.withNorm(spark, sfDir)
    val probes = e.filter($"vec_id" < 50)
      .select($"vec_id".as("q_id"), $"emb".as("q_emb"), $"nrm".as("q_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
    val bf = e.join(broadcast(probes), $"vec_id" =!= $"q_id")
      .withColumn("cos", round(
        graft.functions.GraftFunctions.dot($"emb", $"q_emb") / ($"nrm" * $"q_nrm"), 6))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val recalls = bf.map { case (q, truth) =>
      ivf.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    info(f"mean recall@3 = $mean%.3f over ${recalls.size} queries")
    // the synthetic corpus is only weakly label-clustered, so the
    // meaningful property is that probing 3/10 cells beats the 0.30
    // random-scan-fraction baseline (deterministic: measured 0.493 here);
    // on genuinely clustered data recall approaches 1 at the same nprobe
    assert(mean >= 0.40, f"IVF nprobe=3/10 recall $mean%.3f does not beat the 0.30 scan-fraction baseline margin")
  }

  test("approx_count_distinct within 15% of exact per event_type") {
    import spark.implicits._
    val approx = operators.Aggregations.aggApproxHll.fn(spark, sfDir)
      .select($"event_type", $"approx_users").as[(String, Long)].collect().toMap
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    for ((t, ex) <- exact) {
      val ap = approx(t)
      assert(math.abs(ap - ex).toDouble / ex <= 0.15,
        s"$t: approx $ap vs exact $ex")
    }
  }

  test("decimal centroid equals driver-side computation") {
    import spark.implicits._
    val got = operators.VectorOps.vecCentroidPerLabel.fn(spark, sfDir)
      .select($"label", $"pos", $"centroid".cast("double"))
      .as[(Int, Int, Double)].collect()
      .map { case (l, p, c) => (l, p) -> c }.toMap
    val raw = Tables.embeddings(spark, sfDir)
      .select($"label", $"embedding").as[(Int, Seq[Float])].collect()
    val byLabel = raw.groupBy(_._1)
    for (((l, p), c) <- got) {
      val vals = byLabel(l).map(_._2(p))
      val mean = vals.map(v => BigDecimal(v.toDouble).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / vals.size
      assert(math.abs(mean - c) < 1e-7, s"label $l pos $p: $mean vs $c")
    }
  }

  test("int8 quantization: codes span one byte, mean error under half a quantization step") {
    import spark.implicits._
    val out = SparkEntry.queries("vec_quantize_int8")(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (label, n, minCode, maxCode, meanErr) =>
      assert(minCode >= -128 && maxCode <= 127, s"label $label codes out of int8 range")
      assert(n > 0 && meanErr >= 0, s"label $label: empty or negative error")
    }
    // the worst per-dimension step bounds every value's error at step/2
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"embedding").as[Seq[Float]].collect().map(_.map(_.toDouble))
    val worstStep = (0 until 64).map { d =>
      val col = vecs.map(_(d)); (col.max - col.min) / 255
    }.max
    out.foreach { case (label, _, _, _, meanErr) =>
      assert(meanErr <= worstStep / 2 + 1e-9,
        s"label $label mean |err| $meanErr exceeds half-step bound ${worstStep / 2}")
    }
  }

  test("per-dimension standardization: z-norms match a driver-side recompute") {
    import spark.implicits._
    val raw = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val dims = raw.head._2.length
    val n = raw.length
    // population moments per dimension, double arithmetic on exact sums
    val mu = Array.tabulate(dims) { d =>
      raw.map(r => BigDecimal(r._2(d).toDouble).setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n
    }
    val sigma = Array.tabulate(dims) { d =>
      val sxx = raw.map { r => val v = r._2(d).toDouble
        BigDecimal(v * v).setScale(12, BigDecimal.RoundingMode.HALF_UP) }.sum.toDouble
      math.sqrt((sxx - n * mu(d) * mu(d)) / n)
    }
    val expected = raw.map { case (id, emb) =>
      val zs = Array.tabulate(dims)(d => (emb(d).toDouble - mu(d)) / sigma(d))
      id -> ((math.sqrt(zs.map(z => z * z).sum), zs.map(math.abs).max))
    }.toMap
    val got = operators.VectorOps.vecStandardizeDims.fn(spark, sfDir)
      .select($"vec_id", $"znorm".cast("double"), $"max_abs_z".cast("double"))
      .as[(Long, Double, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (id, zn, mz) =>
      val (ezn, emz) = expected(id)
      assert(math.abs(zn - ezn) < 1e-5 && math.abs(mz - emz) < 1e-6,
        s"vec $id: got ($zn,$mz) expected ($ezn,$emz)")
    }
  }

  test("dedup_embedding_cosine chunked all-pairs ≡ naive all-pairs (sf0.01)") {
    import spark.implicits._
    // the chunked form's (c1 < cb) | (c1 = cb & d1 < d2) coverage
    // predicate must assign every unordered same-label pair to exactly
    // one (label, chunk) key — compare against the direct formulation
    val dir = "/root/testdata/sf0.01"
    val chunked = operators.VectorOps.dedupEmbeddingCosine.fn(spark, dir)
      .select($"label", $"d1", $"d2", $"cos".cast("double"))
      .selectExpr("cast(label as long)", "d1", "d2", "cos").as[(Long, Long, Long, Double)].collect().toSet
    val e = operators.VectorOps.withNorm(spark, dir)
    val a = e.select($"label", $"vec_id".as("d1"), $"emb".as("e1"), $"nrm".as("n1"))
    val b = e.select($"label".as("l2"), $"vec_id".as("d2"), $"emb".as("e2"), $"nrm".as("n2"))
    val naive = a.join(b, $"label" === $"l2" && $"d1" < $"d2")
      .withColumn("cos",
        round(graft.functions.GraftFunctions.dot($"e1", $"e2") / ($"n1" * $"n2"), 6))
      .filter($"cos" >= 0.4)
      .select($"label", $"d1", $"d2", $"cos".cast("double"))
      .selectExpr("cast(label as long)", "d1", "d2", "cos").as[(Long, Long, Long, Double)].collect().toSet
    assert(naive.nonEmpty, "fixture produced no qualifying pairs — test is vacuous")
    assert(chunked == naive,
      s"pair sets differ: only-chunked=${chunked -- naive}, only-naive=${naive -- chunked}")
  }
}
