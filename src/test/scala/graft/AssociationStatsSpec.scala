package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-6 statistical association / risk
  * operators: mathematical properties that hold for ANY input, checked
  * on the real fixtures — complementary to the cross-engine oracle
  * parity each of these queries also carries.
  */
class AssociationStatsSpec extends SparkSpecBase {

  test("mutual information: 0 ≤ MI ≤ min(H), NMI in [0,1], entropies within log2 bounds") {
    val row = SparkEntry.queries("agg_mutual_information")(spark, sfDir).collect().head
    val hType = row.getAs[Double]("h_type")
    val hDow = row.getAs[Double]("h_dow")
    val mi = row.getAs[Double]("mi_bits")
    val nmi = row.getAs[Double]("nmi")
    // entropy of a 5-category / 7-category distribution is bounded by log2(k)
    assert(hType >= 0.0 && hType <= math.log(5.0) / math.log(2.0) + 1e-9, s"h_type $hType")
    assert(hDow >= 0.0 && hDow <= math.log(7.0) / math.log(2.0) + 1e-9, s"h_dow $hDow")
    // MI is non-negative and bounded by either marginal entropy
    // (tolerance covers the 12-dp per-term rounding over ≤35 terms)
    assert(mi >= -1e-6, s"negative MI $mi")
    assert(mi <= math.min(hType, hDow) + 1e-6, s"MI $mi exceeds min entropy")
    assert(nmi >= -1e-9 && nmi <= 1.0 + 1e-9, s"NMI $nmi outside [0,1]")
  }

  test("mutual information: near zero for an independently shuffled dow") {
    import spark.implicits._
    // dow derived from event_id instead of ts is independent of type by
    // construction of the fixture generator — MI must be ~0 relative to
    // the marginal entropies (sampling noise only)
    val ev = Tables.events(spark, sfDir)
      .select($"event_type", ($"event_id" % 7).as("dow"))
    val n = ev.count().toDouble
    val cells = ev.groupBy("event_type", "dow").count().collect()
    val byType = cells.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val byDow = cells.groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    val mi = cells.map { r =>
      val p = r.getLong(2) / n
      p * math.log(p * n * n / (byType(r.getString(0)) * byDow(r.getLong(1)))) / math.log(2.0)
    }.sum
    assert(mi < 0.05, s"independent columns show MI $mi")
  }

  test("welch t-test: t matches hand recomputation from raw balances") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_welch_ttest")(spark, sfDir).collect().head
    val t = row.getAs[Double]("t_stat")
    val df = row.getAs[Double]("df_welch")
    val bal = Tables.customer(spark, sfDir)
      .where($"c_mktsegment".isin("AUTOMOBILE", "BUILDING"))
      .select($"c_mktsegment", $"c_acctbal")
      .as[(String, Double)].collect()
    def stats(seg: String) = {
      val xs = bal.filter(_._1 == seg).map(_._2)
      val m = xs.sum / xs.length
      val v = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
      (xs.length, m, v)
    }
    val (na, ma, va) = stats("AUTOMOBILE")
    val (nb, mb, vb) = stats("BUILDING")
    val se2 = va / na + vb / nb
    val tHand = (ma - mb) / math.sqrt(se2)
    val dfHand = se2 * se2 /
      (va * va / (na.toDouble * na * (na - 1)) + vb * vb / (nb.toDouble * nb * (nb - 1)))
    assert(math.abs(t - tHand) < 1e-4, s"t $t vs hand $tHand")
    assert(math.abs(df - dfHand) < 1e-2, s"df $df vs hand $dfHand")
    // Welch df lies between min(n)-1 and n_a+n_b-2
    assert(df >= math.min(na, nb) - 1 - 1e-6 && df <= na + nb - 2 + 1e-6, s"df $df out of range")
  }

  test("market basket: confidence ≥ support, lift consistent with ratio, keys ordered") {
    val rows = SparkEntry.queries("agg_market_basket_lift")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach { r =>
      val (s, c, l) = (r.getAs[Double]("support"), r.getAs[Double]("confidence"),
        r.getAs[Double]("lift"))
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"), "pair not canonical")
      assert(s > 0 && s <= 1.0, s"support $s")
      // confidence = support/P(a) ≥ support since P(a) ≤ 1
      assert(c >= s - 1e-9, s"confidence $c below support $s")
      assert(l > 0, s"non-positive lift $l")
    }
    // declared order is lift-descending
    val lifts = rows.map(_.getAs[Double]("lift")).toSeq
    assert(lifts == lifts.sorted.reverse, "not sorted by lift desc")
  }

  test("drawdown duration: zero runs iff zero max drawdown, runs bounded by order count") {
    import spark.implicits._
    val dur = SparkEntry.queries("win_drawdown_duration")(spark, sfDir)
      .select($"o_custkey", $"n_orders", $"max_underwater_orders", $"max_underwater_days")
      .as[(Long, Long, Long, Long)].collect()
    val depth = SparkEntry.queries("win_max_drawdown")(spark, sfDir)
      .select($"o_custkey", $"max_drawdown").as[(Long, Double)].collect().toMap
    assert(dur.nonEmpty)
    assert(dur.map(_._1).toSet == depth.keySet, "row sets differ between the two rows")
    dur.foreach { case (ck, n, runOrders, runDays) =>
      assert(runOrders < n, s"customer $ck run $runOrders not shorter than series $n")
      assert(runDays >= 0)
      // a customer is ever underwater exactly when max drawdown > 0
      assert((runOrders > 0) == (depth(ck) > 0.0),
        s"customer $ck: run=$runOrders but depth=${depth(ck)}")
    }
  }

  test("max drawdown: within [0,1), zero iff the series never falls below its peak") {
    import spark.implicits._
    val out = SparkEntry.queries("win_max_drawdown")(spark, sfDir)
      .select($"o_custkey", $"max_drawdown").as[(Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, d) => d >= 0.0 && d < 1.0 }, "drawdown outside [0,1)")
    // hand-check one customer: recompute from the raw chronological series
    val ck = out.head._1
    val series = Tables.orders(spark, sfDir)
      .where($"o_custkey" === ck)
      .orderBy($"o_orderdate", $"o_orderkey")
      .select($"o_totalprice").as[Double].collect()
    var peak = Double.MinValue
    var dd = 0.0
    series.foreach { p =>
      peak = math.max(peak, p)
      dd = math.max(dd, (peak - p) / peak)
    }
    assert(math.abs(out.head._2 - dd) < 1e-4, s"declared ${out.head._2} vs hand $dd")
  }

  test("funnel latency: order stats monotone, converters bounded by signups") {
    val row = SparkEntry.queries("agg_funnel_latency")(spark, sfDir).collect().head
    val nS = row.getAs[Long]("n_signups")
    val nC = row.getAs[Long]("n_converters")
    val (p25, p50, p75) = (row.getAs[Double]("p25_s"),
      row.getAs[Double]("p50_s"), row.getAs[Double]("p75_s"))
    assert(nC > 0 && nC <= nS, s"converters $nC vs signups $nS")
    assert(p25 >= 0.0 && p25 <= p50 && p50 <= p75, s"quartiles not monotone: $p25 $p50 $p75")
    // a purchase at-or-after signup can have zero latency but never negative
    assert(p25 >= 0.0)
  }

  test("attribution: shares sum to 1, channels limited to non-purchase types plus none") {
    val rows = SparkEntry.queries("agg_attribution_last_touch")(spark, sfDir).collect()
    val allowed = Set("click", "error", "signup", "view", "none")
    rows.foreach { r =>
      assert(allowed.contains(r.getAs[String]("channel")),
        s"unexpected channel ${r.getAs[String]("channel")}")
    }
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // total conversions equals the purchase count in the stream
    import spark.implicits._
    val purchases = Tables.events(spark, sfDir)
      .where($"event_type" === "purchase").count()
    assert(rows.map(_.getAs[Long]("conversions")).sum == purchases)
  }

  test("negative sampling: 3 negatives per query, all cross-label, md5-reproducible") {
    import spark.implicits._
    val rows = SparkEntry.queries("sample_negative_pairs")(spark, sfDir)
      .select($"q_id", $"q_label", $"neg_rank", $"neg_id", $"neg_label")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).distinct.length == 10)
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == Seq(1L, 2L, 3L), s"query $q ranks")
      assert(rs.forall(r => r._5 != r._2), s"query $q drew a same-label negative")
    }
    // reproduce one query's picks with a driver-side md5 ranking
    val labels = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label").as[(Long, Int)].collect()
    val qLabel = labels.toMap.apply(0L)
    def h(q: Long, c: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$q:$c".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = labels.filter(_._2 != qLabel)
      .sortBy { case (id, _) => (h(0L, id), id) }.take(3).map(_._1).toSeq
    val got = rows.filter(_._1 == 0L).sortBy(_._3).map(_._4).toSeq
    assert(got == expected, s"q0 negatives $got vs hand $expected")
  }

  test("markov stationary: probabilities sum to 1, match a driver-side 8-round iterate") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_markov_stationary")(spark, sfDir)
      .select($"event_type", $"stationary_prob", $"empirical_share")
      .as[(String, Double, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0.0))
    val sSum = rows.map(_._2).sum
    assert(math.abs(sSum - 1.0) < 1e-4, s"stationary sums to $sSum")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "empirical shares don't sum to 1")
    // independent iterate from the raw stream (same formulation, double math)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    import org.apache.spark.sql.functions._
    val pairs = Tables.events(spark, sfDir)
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .where($"nxt".isNotNull)
      .groupBy($"event_type", $"nxt").count()
      .as[(String, String, Long)].collect()
    val states = pairs.map(_._1).distinct.sorted
    val rowSums = pairs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = pairs.map { case (c, n, cnt) =>
      (c, n) -> math.rint(cnt.toDouble / rowSums(c) * 1e9) / 1e9
    }.toMap
    var pi = states.map(_ -> 1.0 / states.length).toMap
    for (_ <- 1 to 8) {
      pi = states.map { t =>
        val s = states.map(c => p.getOrElse((c, t), 0.0) * pi(c)).sum
        t -> math.rint(s * 1e9) / 1e9
      }.toMap
    }
    rows.foreach { case (t, sp, _) =>
      assert(math.abs(sp - pi(t)) < 1e-5, s"state $t: declared $sp vs hand ${pi(t)}")
    }
  }

  test("cohort ltv: cumulative revenue non-decreasing in age per cohort, age 0 present") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_cohort_ltv_curve")(spark, sfDir)
      .select($"cohort".cast("string"), $"age", $"cum_rev", $"ltv_per_customer")
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cohort, rs) =>
      val byAge = rs.sortBy(_._2)
      // every cohort starts at age 0 — its members ordered in that month
      assert(byAge.head._2 == 0L, s"cohort $cohort missing age 0")
      val cums = byAge.map(_._3)
      assert(cums.toSeq == cums.sorted.toSeq, s"cohort $cohort LTV not monotone")
      assert(rs.forall(r => r._4 > 0.0), s"cohort $cohort non-positive per-customer LTV")
    }
    // total terminal LTV mass equals total order revenue (2-dp decimal)
    val terminal = rows.groupBy(_._1).map(_._2.maxBy(_._2)._3).sum
    val total = Tables.orders(spark, sfDir)
      .select(org.apache.spark.sql.functions.sum(
        graft.Tables.dec($"o_totalprice")).cast("double")).as[Double].collect().head
    assert(math.abs(terminal - total) < 1e-6, s"terminal LTV $terminal vs revenue $total")
  }

  test("rolling corr: every value in [-1,1] and only full frames emitted") {
    import spark.implicits._
    val out = SparkEntry.queries("win_rolling_corr")(spark, sfDir)
      .select($"rolling_corr").as[Option[Double]].collect()
    assert(out.nonEmpty)
    assert(out.flatten.forall(c => c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9),
      "correlation outside [-1,1]")
    // full-frame rule: per supplier, emitted rows = max(0, rows-9)
    val emitted = SparkEntry.queries("win_rolling_corr")(spark, sfDir).count()
    val expected = Tables.lineitem(spark, sfDir)
      .where($"l_suppkey" < 20)
      .groupBy($"l_suppkey").count()
      .select(greatest($"count" - 9, lit(0L)).as("e"))
      .agg(sum($"e")).as[Long].collect().head
    assert(emitted == expected, s"emitted $emitted vs expected $expected")
  }

  test("entropy rate: 0 ≤ H(next|cur) ≤ H(next) ≤ log2(k), matches hand recompute") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_entropy_rate_markov")(spark, sfDir).collect().head
    val hCond = row.getAs[Double]("h_cond_bits")
    val hNext = row.getAs[Double]("h_next_bits")
    val gain = row.getAs[Double]("context_gain_bits")
    // conditioning never increases entropy; marginal bounded by log2(#types)
    assert(hCond >= -1e-9, s"negative conditional entropy $hCond")
    assert(hCond <= hNext + 1e-6, s"H(next|cur)=$hCond above H(next)=$hNext")
    assert(hNext <= math.log(5.0) / math.log(2.0) + 1e-9, s"h_next $hNext above log2 k")
    assert(math.abs(gain - (hNext - hCond)) < 1e-6, "gain != hNext - hCond")
    // hand recompute both entropies from the raw pair counts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("from_type", lag($"event_type", 1).over(w))
      .where($"from_type".isNotNull)
      .groupBy($"from_type", $"event_type").count()
      .as[(String, String, Long)].collect()
    val n = pairs.map(_._3).sum.toDouble
    val fromN = pairs.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val toN = pairs.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
    def lg2(x: Double) = math.log(x) / math.log(2.0)
    val hc = -pairs.map(p => (p._3 / n) * lg2(p._3 / fromN(p._1))).sum
    val hn = -toN.values.map(t => (t / n) * lg2(t / n)).sum
    assert(math.abs(hCond - hc) < 1e-5, s"h_cond $hCond vs hand $hc")
    assert(math.abs(hNext - hn) < 1e-5, s"h_next $hNext vs hand $hn")
  }

  test("kadane burst: equals the brute-force max over all contiguous day spans") {
    import spark.implicits._
    val out = SparkEntry.queries("win_kadane_burst")(spark, sfDir)
      .select($"event_type", $"peak_burst").as[(String, Double)].collect().toMap
    val daily = Tables.events(spark, sfDir)
      .select($"event_type", $"ts".cast("date").cast("string").as("d"))
      .groupBy($"event_type", $"d").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3.toDouble).toVector).toMap
    for ((t, cs) <- daily) {
      val mean = cs.sum / cs.size
      val dev = cs.map(c => math.rint((c - mean) * 1e6) / 1e6)
      val best = (for {
        i <- dev.indices; j <- i until dev.size
      } yield dev.slice(i, j + 1).sum).max
      assert(math.abs(out(t) - best) < 1e-4,
        s"$t kadane ${out(t)} vs brute-force $best")
    }
  }
  test("interpurchase gaps: segments partition the gap population, median straddles half") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_interpurchase_gaps")(spark, sfDir)
      .select($"c_mktsegment", $"n_gaps", $"mean_gap_days".cast("double"),
        $"p50_gap_days")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.length == 5, "expected the 5 TPC-H market segments")
    assert(rows.forall(r => r._2 > 0 && r._3 > 0.0 && r._4 >= 0), "non-positive stats")
    // every customer with k>=2 orders contributes k-1 gaps:
    // total gaps = total orders - customers with at least one order
    val o = Tables.orders(spark, sfDir)
    val expected = o.count() - o.select($"o_custkey").distinct().count()
    assert(rows.map(_._2).sum == expected, "gap population mismatch")
    // hand recompute each segment's gaps; check mean and the discrete
    // lower-median rank definition (cum count straddles ceil(n/2))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val gaps = o.select($"o_custkey", $"o_orderdate", $"o_orderkey")
      .withColumn("prev_d", lag($"o_orderdate", 1).over(w))
      .where($"prev_d".isNotNull)
      .select($"o_custkey", datediff($"o_orderdate", $"prev_d").as("gap"))
      .join(Tables.customer(spark, sfDir).select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"gap".cast("long"))
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for ((seg, n, mean, p50) <- rows) {
      val g = gaps(seg)
      assert(g.length == n, s"$seg n_gaps")
      assert(math.abs(mean - g.sum.toDouble / g.length) < 1e-6, s"$seg mean")
      assert(g((g.length + 1) / 2 - 1) == p50, s"$seg median")
    }
  }
  test("anova: F and eta-sq match a driver-side recompute from raw balances") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_anova_oneway")(spark, sfDir).collect().head
    val k = row.getAs[Long]("k")
    val nTotal = row.getAs[Long]("n_total")
    val f = row.getAs[Double]("f_stat")
    val eta = row.getAs[Double]("eta_sq")
    assert(k == 5, "expected the 5 TPC-H market segments")
    assert(row.getAs[Long]("df_between") == k - 1)
    assert(row.getAs[Long]("df_within") == nTotal - k)
    assert(f >= 0.0 && eta >= 0.0 && eta <= 1.0)
    val bySeg = Tables.customer(spark, sfDir)
      .select($"c_mktsegment", $"c_acctbal".cast("double"))
      .as[(String, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(nTotal == bySeg.values.map(_.length).sum)
    val grand = bySeg.values.flatten.sum / nTotal
    val ssb = bySeg.values.map(g => g.length * math.pow(g.sum / g.length - grand, 2)).sum
    val ssw = bySeg.values.map(g => { val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }).sum
    val fRef = (ssb / (k - 1)) / (ssw / (nTotal - k))
    assert(math.abs(f - fRef) < 1e-4, s"F $f vs recompute $fRef")
    assert(math.abs(eta - ssb / (ssb + ssw)) < 1e-6, s"eta $eta vs ${ssb / (ssb + ssw)}")
  }

  test("theil-sen: pair counts are triangular, slopes match a driver-side recompute") {
    import spark.implicits._
    val rows = SparkEntry.queries("win_theil_sen_trend")(spark, sfDir)
      .select($"n_name", $"n_months", $"n_pairs",
        $"sen_slope".cast("double"), $"ols_slope".cast("double"))
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._3 == r._2 * (r._2 - 1) / 2), "pairs not n(n-1)/2")
    // driver-side recompute of both slopes from the same monthly rollup
    val monthly = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.nation(spark, sfDir), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name", (year($"l_shipdate") * 12 + month($"l_shipdate")).as("mi"))
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .select($"n_name", $"mi", $"rev".cast("double"))
      .as[(String, Int, Double)].collect().groupBy(_._1)
    for ((name, _, np, sen, ols) <- rows) {
      val pts = monthly(name).map(t => (t._2, t._3)).sortBy(_._1)
      val slopes = (for {
        Array((m1, r1), (m2, r2)) <- pts.combinations(2).map(_.toArray)
      } yield (r2 - r1) / (m2 - m1)).toArray.sorted
      assert(slopes.length == np)
      assert(math.abs(sen - slopes(((np + 1) / 2 - 1).toInt)) < 1e-4,
        s"$name sen $sen vs ${slopes(((np + 1) / 2 - 1).toInt)}")
      val n = pts.length
      val sx = pts.map(_._1.toDouble).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1.toDouble * p._1).sum
      val olsRef = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(ols - olsRef) < 1e-3, s"$name ols $ols vs $olsRef")
    }
  }

  test("adamic-adar: predicted links are non-adjacent pairs scored from true common neighbors") {
    import spark.implicits._
    val out = SparkEntry.queries("graph_adamic_adar")(spark, sfDir)
      .select($"a_name", $"b_name", $"common_neighbors", $"aa_score".cast("double"))
      .as[(String, String, Long, Double)].collect()
    assert(out.nonEmpty && out.length <= 10)
    assert(out.forall(r => r._3 >= 1 && r._4 > 0.0), "empty or non-positive score")
    // rebuild the same top-50 undirected edge set and score by hand
    val nk = Tables.nation(spark, sfDir)
      .select($"n_nationkey", $"n_name").as[(Long, String)].collect()
      .map { case (k, n) => (n, k) }.toMap
    val edges = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(Tables.supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .join(Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .where($"s_nationkey" =!= $"c_nationkey")
      .groupBy(least($"s_nationkey", $"c_nationkey").as("a"),
        greatest($"s_nationkey", $"c_nationkey").as("b"))
      .agg(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("w"))
      .select($"a", $"b", $"w".cast("double"))
      .as[(Long, Long, Double)].collect()
      .sortBy(t => (-t._3, t._1, t._2)).take(50).map(t => (t._1, t._2)).toSet
    val nbr = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((an, bn, cn, aa) <- out) {
      val (a, b) = (nk(an), nk(bn))
      assert(!edges.contains((math.min(a, b), math.max(a, b))), s"$an-$bn already adjacent")
      val common = nbr.getOrElse(a, Set.empty) & nbr.getOrElse(b, Set.empty)
      assert(common.size == cn, s"$an-$bn cn $cn vs ${common.size}")
      val aaRef = common.toSeq.map(w => 1.0 / math.log(nbr(w).size)).sum
      assert(math.abs(aa - aaRef) < 1e-4, s"$an-$bn aa $aa vs $aaRef")
    }
  }
  test("poisson bootstrap: replicate weights cover ~n, CI brackets the point mean sanely") {
    import spark.implicits._
    val rows = SparkEntry.queries("sample_poisson_bootstrap")(spark, sfDir)
      .select($"b", $"n_eff", $"boot_mean".cast("double"), $"point_mean".cast("double"),
        $"boot_se".cast("double"), $"ci_lo".cast("double"), $"ci_hi".cast("double"))
      .as[(Long, Long, Double, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 31L), "expected 32 replicates")
    val n = Tables.orders(spark, sfDir).count()
    // Poisson(1) weights: each replicate's effective n concentrates near n
    assert(rows.forall(r => math.abs(r._2 - n) < 5 * math.sqrt(n.toDouble)),
      "replicate effective n far from corpus size")
    val (pm, se, lo, hi) = (rows.head._4, rows.head._5, rows.head._6, rows.head._7)
    assert(rows.map(r => (r._4, r._5, r._6, r._7)).distinct.length == 1, "summary not constant")
    assert(se > 0.0 && lo <= hi, "degenerate bootstrap spread")
    // hand recompute SE and the rank-2/rank-31 CI from the replicate means
    val ms = rows.map(_._3).sorted
    val mbar = ms.sum / ms.length
    val seRef = math.sqrt(ms.map(m => (m - mbar) * (m - mbar)).sum / (ms.length - 1))
    assert(math.abs(se - seRef) < 1e-4, s"se $se vs $seRef")
    assert(lo == ms(1) && hi == ms(30), "CI not the rank-2/rank-31 order statistics")
    // the point mean sits inside (or at worst a hair outside) the 90% CI
    assert(pm > lo - 3 * se && pm < hi + 3 * se, "point mean far outside the CI")
  }

  test("autocorr: lags 1..7, |acf| bounded by 1, term counts shrink by the lag") {
    import spark.implicits._
    val rows = SparkEntry.queries("win_autocorr_daily")(spark, sfDir)
      .select($"lag", $"n_terms", $"acf".cast("double"))
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 7L))
    val nDays = Tables.lineitem(spark, sfDir).select($"l_shipdate").distinct().count()
    assert(rows.forall(r => r._2 == nDays - r._1), "n_terms != n - k")
    assert(rows.forall(r => math.abs(r._3) <= 1.0 + 1e-9), "|acf| above 1")
  }

  test("jl audit: full probe pair set, positive distances, ratio stats ordered and near 1") {
    import spark.implicits._
    val row = SparkEntry.queries("vec_jl_projection_audit")(spark, sfDir).collect().head
    val nPairs = row.getAs[Long]("n_pairs")
    val nDeg = row.getAs[Long]("n_degenerate")
    val mean = row.getAs[Double]("mean_ratio")
    val mn = row.getAs[Double]("min_ratio")
    val mx = row.getAs[Double]("max_ratio")
    val share = row.getAs[Double]("share_within_03")
    val nProbe = Tables.embeddings(spark, sfDir).where($"vec_id" < 50).count()
    assert(nPairs == nProbe * (nProbe - 1) / 2, "probe pairs not all-pairs")
    assert(nDeg >= 0 && nDeg <= nPairs)
    assert(mn > 0.0 && mn <= mean && mean <= mx, "ratio stats out of order")
    // E[ratio] = 1 under JL; the mean over >1000 pairs concentrates hard
    assert(mean > 0.7 && mean < 1.3, s"mean distortion $mean far from 1")
    assert(share >= 0.0 && share <= 1.0)
  }
  test("seasonality strength: weekday profile covers interior days, strength bounded") {
    import spark.implicits._
    val rows = SparkEntry.queries("win_seasonality_strength")(spark, sfDir)
      .select($"wd", $"n_days", $"seasonal".cast("double"),
        $"var_detrended".cast("double"), $"var_residual".cast("double"),
        $"strength".cast("double"))
      .as[(Long, Long, Double, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 6L), "expected the 7 weekday rows")
    // full 7-day frames exclude exactly the first and last 3 observed days
    val nDays = Tables.lineitem(spark, sfDir).select($"l_shipdate").distinct().count()
    assert(rows.map(_._2).sum == nDays - 6, "interior day coverage wrong")
    val (vd, vr, st) = (rows.head._4, rows.head._5, rows.head._6)
    assert(rows.map(r => (r._4, r._5, r._6)).distinct.length == 1, "summary not constant")
    assert(vd > 0.0 && vr >= 0.0, "degenerate variances")
    assert(st >= 0.0 && st <= 1.0 + 1e-9, s"strength $st outside [0,1]")
    // removing the weekday means can only reduce variance up to rounding slack
    assert(vr <= vd + 1e-3, s"residual variance $vr above detrended $vd")
    assert(math.abs(st - math.max(0.0, 1.0 - vr / vd)) < 1e-5, "strength formula broken")
  }

  test("neyman allocation: budget respected, allocation tracks n_h*s_h, sampling realizes it") {
    import spark.implicits._
    val rows = SparkEntry.queries("sample_stratified_neyman")(spark, sfDir)
      .select($"c_mktsegment", $"n_h", $"s_h".cast("double"), $"alloc_n",
        $"n_sampled", $"realized_rate".cast("double"))
      .as[(String, Long, Double, Long, Long, Double)].collect()
    assert(rows.length == 5)
    val totalAlloc = rows.map(_._4).sum
    assert(totalAlloc <= 1000 && totalAlloc > 1000 - 5, s"floor allocation $totalAlloc outside (995,1000]")
    assert(rows.forall(r => r._3 > 0.0 && r._4 >= 0 && r._5 >= 0))
    // Neyman monotonicity: allocation ordering follows the n_h*s_h weights
    val byWeight = rows.sortBy(r => r._2 * r._3)
    assert(byWeight.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)),
      "allocation not monotone in n_h*s_h")
    // realized sample concentrates near the target (binomial, 5 sigma)
    rows.foreach { r =>
      val sd = math.sqrt(r._4.toDouble max 1.0)
      assert(math.abs(r._5 - r._4) <= 5 * sd + 3,
        s"${r._1} sampled ${r._5} far from target ${r._4}")
    }
  }
  test("kaplan-meier: risk set shrinks, survival falls, matches a driver-side recompute") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_survival_km")(spark, sfDir)
      .select($"t_days", $"n_risk", $"d_events", $"ln_surv".cast("double"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._2 <= Tables.orders(spark, sfDir).count(), "risk set above subjects")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 < a._2, "risk set must strictly shrink between event days")
        assert(b._4 <= a._4 + 1e-12, "survival increased")
      case _ =>
    }
    assert(rows.forall(r => r._3 >= 1 && r._3 < r._2), "events outside (0, n_risk)")
    assert(rows.forall(_._4 <= 1e-12), "positive log-survival")
    // recompute the whole curve from raw durations (censor at max date)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val hz = Tables.orders(spark, sfDir).agg(max($"o_orderdate").as("hz"))
    val durs = Tables.orders(spark, sfDir)
      .withColumn("nxt", lead($"o_orderdate", 1).over(w))
      .crossJoin(broadcast(hz))
      .select(
        when($"nxt".isNotNull, datediff($"nxt", $"o_orderdate"))
          .otherwise(datediff($"hz", $"o_orderdate")).cast("long").as("t"),
        when($"nxt".isNotNull, 1).otherwise(0).as("ev"))
      .as[(Long, Int)].collect()
    val n = durs.length
    val byT = durs.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.count(_._2 == 1).toLong)).toMap
    var atRisk = n.toLong; var lnS = 0.0
    val ref = scala.collection.mutable.Map[Long, (Long, Long, Double)]()
    for (t <- byT.keys.toSeq.sorted) {
      val (c, d) = byT(t)
      if (d > 0 && d < atRisk) {
        lnS += math.log(1.0 - d.toDouble / atRisk)
        ref(t) = (atRisk, d, lnS)
      }
      atRisk -= c
    }
    for ((t, nr, d, ls) <- rows) {
      val (nrR, dR, lsR) = ref(t)
      assert(nr == nrR && d == dR, s"t=$t risk/event mismatch")
      assert(math.abs(ls - lsR) < 1e-4, s"t=$t ln_surv $ls vs $lsR")
    }
    assert(rows.length == ref.size, "curve length mismatch")
  }

  test("hurst: five dyadic block sizes, R/S grows with n, H in a sane band") {
    import spark.implicits._
    val rows = SparkEntry.queries("win_hurst_exponent")(spark, sfDir)
      .select($"block_size", $"n_blocks", $"mean_ln_rs".cast("double"),
        $"hurst".cast("double"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L, 128L))
    val nDays = Tables.lineitem(spark, sfDir).select($"l_shipdate").distinct().count()
    assert(rows.forall(r => r._2 <= nDays / r._1 && r._2 >= 1), "block counts off")
    // rescaled range grows with block length for any non-degenerate series
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
      "mean ln(R/S) not increasing in n")
    val h = rows.head._4
    assert(rows.forall(_._4 == h), "hurst not constant")
    // OLS slope of 5 increasing points stays in a generous (0, 1.25) band
    assert(h > 0.0 && h < 1.25, s"hurst $h outside (0,1.25)")
  }
  test("gains deciles: partition customers, shares sum to 1, curve concave from the top") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_gains_deciles")(spark, sfDir)
      .select($"decile", $"n_customers", $"rev_share".cast("double"),
        $"cum_share".cast("double"))
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSet.subsetOf((1L to 10L).toSet))
    val nCust = Tables.orders(spark, sfDir).select($"o_custkey").distinct().count()
    assert(rows.map(_._2).sum == nCust, "deciles don't partition customers")
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares don't sum to 1")
    assert(math.abs(rows.last._4 - 1.0) < 1e-4, "cumulative share doesn't reach 1")
    // decile 1 holds the biggest spenders: per-capita revenue must be
    // non-increasing down the deciles
    val perCap = rows.map(r => r._3 / r._2)
    assert(perCap.sliding(2).forall(w => w.length < 2 || w(0) >= w(1) - 1e-12),
      "per-capita revenue not decreasing down the deciles")
    // cumulative share is the prefix sum of the shares
    val prefix = rows.map(_._3).scanLeft(0.0)(_ + _).tail
    rows.zip(prefix).foreach { case (r, p) =>
      assert(math.abs(r._4 - p) < 1e-4, s"decile ${r._1} cum ${r._4} vs $p") }
  }
  test("mde power: consistent with the welch moments, scales with the sqrt-n law") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_mde_power")(spark, sfDir).collect().head
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val mdeAbs = row.getAs[Double]("mde_abs")
    val mdeRel = row.getAs[Double]("mde_rel")
    assert(mdeAbs > 0.0 && mdeRel > 0.0)
    assert(row.getAs[Long]("n_a_for_half_mde") == na * 4)
    assert(row.getAs[Long]("n_b_for_half_mde") == nb * 4)
    // recompute from raw balances: mde = (z975 + z80) * se_welch
    val g = Tables.customer(spark, sfDir)
      .where($"c_mktsegment".isin("AUTOMOBILE", "BUILDING"))
      .select($"c_mktsegment", $"c_acctbal".cast("double"))
      .as[(String, Double)].collect().groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def varOf(xs: Array[Double]) = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val (a, b) = (g("AUTOMOBILE"), g("BUILDING"))
    assert(na == a.length && nb == b.length)
    val se = math.sqrt(varOf(a) / a.length + varOf(b) / b.length)
    val ref = (1.959963984540054 + 0.8416212335729143) * se
    assert(math.abs(mdeAbs - ref) < 1e-4, s"mde $mdeAbs vs $ref")
    assert(math.abs(mdeRel - ref / (a.sum / a.length)) < 1e-6, "relative mde inconsistent")
  }
  test("reconciliation: statuses cover all orders, mismatch decision matches exact recompute") {
    import spark.implicits._
    val rows = SparkEntry.queries("etl_reconciliation_totals")(spark, sfDir)
      .select($"o_orderstatus", $"n_orders", $"n_no_lines", $"n_mismatch",
        $"max_abs_diff".cast("double"))
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.map(_._2).sum == Tables.orders(spark, sfDir).count(),
      "statuses don't cover all orders")
    assert(rows.forall(r => r._3 + r._4 <= r._2), "mismatch+no_lines above order count")
    // exact recompute of one status's mismatch count with BigDecimal algebra
    val recomputed = Tables.lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1) - $"l_discount".cast("decimal(18,2)")) *
        (lit(1) + $"l_tax".cast("decimal(18,2)"))).as("rc"))
    val joined = Tables.orders(spark, sfDir)
      .join(recomputed, $"o_orderkey" === $"l_orderkey", "left")
      .select($"o_orderstatus", $"o_totalprice".cast("decimal(18,2)").as("h"),
        $"rc".cast("decimal(38,6)").as("rc"))
      .as[(String, java.math.BigDecimal, java.math.BigDecimal)].collect()
    val tol = new java.math.BigDecimal("0.01")
    val refMis = joined.groupBy(_._1).view.mapValues(_.count { case (_, h, rc) =>
      rc != null && h.subtract(rc).abs.compareTo(tol) > 0 }).toMap
    val refNo = joined.groupBy(_._1).view.mapValues(_.count(_._3 == null)).toMap
    rows.foreach { r =>
      assert(r._4 == refMis(r._1), s"${r._1} mismatch ${r._4} vs ${refMis(r._1)}")
      assert(r._3 == refNo(r._1), s"${r._1} no-lines ${r._3} vs ${refNo(r._1)}")
      assert(r._5 >= 0.0)
    }
  }
  test("stickiness: bounded by 1/n_days and 1, components agree with direct counts") {
    import spark.implicits._
    val rows = SparkEntry.queries("agg_dau_mau_stickiness")(spark, sfDir)
      .select($"month".cast("string"), $"n_days", $"mau",
        $"mean_dau".cast("double"), $"stickiness".cast("double"))
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._5 > 0.0 && r._5 <= 1.0 + 1e-9, s"stickiness ${r._5} outside (0,1]")
      assert(r._4 <= r._3 + 1e-9, "mean DAU above MAU")
      assert(math.abs(r._5 - r._4 / r._3) < 1e-5, "stickiness != mean_dau/mau")
    }
    // months cover every event day; total distinct users bound MAU
    val nDays = Tables.events(spark, sfDir).select($"ts".cast("date")).distinct().count()
    assert(rows.map(_._2).sum == nDays, "month day counts don't cover the corpus")
  }
}
