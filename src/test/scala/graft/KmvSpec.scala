package graft

import org.apache.spark.sql.functions._

import graft.operators.Kmv

/** [[graft.operators.Kmv]] — the hash-checkable KMV distinct/overlap
  * sketch. The registered `segment_overlap` query proves bitwise oracle
  * agreement on real data; this spec pins the ESTIMATOR properties the
  * oracle can't see: exact collapse below k, mergeability (the union
  * sketch IS the merge of sketches), and the accuracy the (k−1)·H/θ
  * theory promises on non-degenerate overlaps (the corpus' segments
  * are fully-overlapping, so the interesting overlap regimes only
  * appear here). Everything is deterministic (md5, fixed ids), so the
  * measured errors are pinned, not probabilistic. */
class KmvSpec extends SparkTestBase {

  import spark.implicits._

  private val K = 128

  private def overlapRowOf(aIds: Seq[Long], bIds: Seq[Long]) = {
    val df = (aIds.map(("a", _)) ++ bIds.map(("b", _))).toDF("g", "id")
    val sk = Kmv.sketch(df, col("g"), col("id"), K)
    val pairs = sk.filter(col("g") === "a")
      .select(col("sk").as("ska"), col("n_exact").as("n_a"))
      .crossJoin(sk.filter(col("g") === "b")
        .select(col("sk").as("skb"), col("n_exact").as("n_b")))
    Kmv.overlapEstimates(pairs, K)
      .select("n_a", "n_b", "est_union", "est_intersect", "jaccard_est",
        "est_a_only", "est_b_only")
      .as[(Long, Long, Double, Double, Double, Double, Double)].head()
  }

  private def overlapOf(aIds: Seq[Long], bIds: Seq[Long]) = {
    val r = overlapRowOf(aIds, bIds)
    (r._1, r._2, r._3, r._4, r._5)
  }

  test("below k the sketch IS the set: estimates collapse to exact counts") {
    val a = (0L until 60L)
    val b = (40L until 90L) // |A|=60 |B|=50 |A∩B|=20 |A∪B|=90 < k
    val (na, nb, estU, estI, j) = overlapOf(a, b)
    assert(na == 60 && nb == 50)
    assert(estU == 90.0, s"union $estU")
    assert(estI == 20.0, s"intersect $estI")
    assert(j == 20.0 / 90.0)
  }

  test("estimates track truth within the KMV error regime on large overlaps") {
    // |A|=3000, |B|=2500, |A∩B|=1000, |A∪B|=4500 — all ≫ k=128, so the
    // θ estimator is fully engaged. RSE ≈ 1/√(k−2) ≈ 8.9%; the fixed
    // hash makes these errors deterministic, so pin a 3-RSE envelope.
    val a = (0L until 3000L)
    val b = (2000L until 4500L)
    val (na, nb, estU, estI, j) = overlapOf(a, b)
    assert(na == 3000 && nb == 2500)
    assert(math.abs(estU - 4500.0) / 4500.0 < 0.27, s"union est $estU")
    assert(math.abs(estI - 1000.0) / 1000.0 < 0.40, s"intersect est $estI")
    assert(math.abs(j - 1000.0 / 4500.0) < 0.10, s"jaccard est $j")
  }

  test("disjoint sets estimate zero intersection exactly") {
    val (_, _, estU, estI, j) = overlapOf(0L until 1000L, 5000L until 6000L)
    assert(estI == 0.0 && j == 0.0)
    assert(math.abs(estU - 2000.0) / 2000.0 < 0.27, s"union est $estU")
  }

  test("NULL keys are excluded on both sketch and count; empty sketches never crash") {
    val df = Seq(("a", Option(1L)), ("a", Option(2L)), ("a", Option.empty[Long]),
      ("b", Option.empty[Long])).toDF("g", "id")
    val sk = Kmv.sketch(df, col("g"), col("id"), K)
      .select("g", "sk", "n_exact").as[(String, Seq[Long], Long)]
      .collect().map(r => r._1 -> (r._2.size, r._3)).toMap
    assert(sk("a") == (2, 2L), "null key must not count or sketch")
    assert(!sk.contains("b") || sk("b") == (0, 0L),
      "an all-null group is empty, never a null-bearing sketch")
    // empty-vs-empty pair: no element_at(0) crash, exact zeros, NULL jaccard
    val pairs = Seq((Seq.empty[Long], Seq.empty[Long])).toDF("ska", "skb")
    val row = Kmv.overlapEstimates(pairs, K)
      .select("est_union", "est_intersect", "jaccard_est")
      .as[(Double, Double, Option[Double])].head()
    assert(row == ((0.0, 0.0, None)))
  }

  test("mergeability: the union's sketch equals the merge of the sketches") {
    val a = (0L until 700L).map(("a", _))
    val b = (300L until 1200L).map(("b", _))
    val both = (a ++ b).map { case (_, id) => ("u", id) }
    val df = (a ++ b ++ both).toDF("g", "id")
    val sk = Kmv.sketch(df, col("g"), col("id"), K)
      .select("g", "sk").as[(String, Seq[Long])].collect().toMap
    val merged = (sk("a") ++ sk("b")).distinct.sorted.take(K)
    assert(sk("u") == merged,
      "sketch(A ∪ B) must equal bottom-k of sketch(A) ∪ sketch(B)")
  }

  test("KmvSketchAgg ≡ sorted-distinct-take-k regardless of partitioning (scalacheck)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.choose(0, 400)
      vals <- Gen.listOfN(n, Gen.choose(0L, 50L)) // heavy duplication
      parts <- Gen.choose(1, 13)
      k <- Gen.choose(2, 40)
    } yield (vals, parts, k)
    val prop = Prop.forAll(gen) { case (vals, parts, k) =>
      val got = vals.toDF("h").repartition(parts)
        .agg(graft.functions.KmvSketchAgg(col("h"), k).as("sk"))
        .as[Seq[Long]].head()
      got == vals.distinct.sorted.take(k)
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(result.passed, result.status.toString)
  }

  test("the sketch fold is map-side partial: graft_kmv partials precede the exchange") {
    val plan = Kmv.sketch((0L until 1000L).map(i => (i % 7, i)).toDF("g", "id"),
        col("g"), col("id"), K)
      .queryExecution.executedPlan.toString
    // a partial graft_kmv below an Exchange = each task folds to ≤ k
    // values per group before any data moves
    val partialIdx = plan.indexOf("partial_graft_kmv")
    assert(partialIdx >= 0, plan.take(2000))
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0 && exchangeIdx < partialIdx,
      s"partial fold should sit BELOW the exchange in the printed tree:\n${plan.take(2000)}")
  }

  test("difference estimates collapse exactly below k and partition the union") {
    // |A∖B|=40, |B∖A|=30, below k: every estimate is the exact count
    val (_, _, _, _, _, ea, eb) = overlapRowOf(0L until 60L, 40L until 90L)
    assert(ea == 40.0, s"est_a_only $ea")
    assert(eb == 30.0, s"est_b_only $eb")
  }

  test("difference estimates: ρ-partition makes int+aOnly+bOnly ≡ union, and 3-RSE accuracy holds") {
    // |A∖B|=2000, |B∖A|=1500, |A∩B|=1000 — θ estimator fully engaged
    val (_, _, estU, estI, _, ea, eb) = overlapRowOf(0L until 3000L, 2000L until 4500L)
    // the three sample counts partition the k-sample EXACTLY, so the
    // estimates sum to est_union up to three IEEE roundings
    assert(math.abs((estI + ea + eb) - estU) <= 1e-9 * estU,
      s"partition law: $estI + $ea + $eb != $estU")
    assert(math.abs(ea - 2000.0) / 2000.0 < 0.27, s"a-only est $ea")
    assert(math.abs(eb - 1500.0) / 1500.0 < 0.40, s"b-only est $eb")
  }

  test("exclusive reach at sf0.001: below-k total collapses estimates to exact counts") {
    val rows = SparkEntry.queries("segment_exclusive_reach")(spark, sf0001)
      .select("event_type", "n_reach_exact", "n_excl_exact", "est_reach",
        "est_exclusive")
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val totalDistinct = rows.map(_._2).max // <= true total; enough to know < K
    rows.foreach { case (g, nr, ne, estR, estE) =>
      assert(ne <= nr, s"$g exclusive > reach")
      if (nr < K) assert(estR == nr.toDouble, s"$g est_reach $estR != $nr")
    }
    // sf0.001 has ~64 users total, far below k: the union sketch is the
    // whole audience and exclusive estimates are exact
    if (totalDistinct < K)
      rows.foreach { case (g, _, ne, _, estE) =>
        assert(estE == ne.toDouble, s"$g est_exclusive $estE != exact $ne")
      }
  }

  test("exclusive reach: multi-way estimator tracks truth in the θ regime") {
    // three segments over a 6000-user universe with planted exclusives:
    // A = [0,3000), B = [2000,4500), C = [4000,6000)
    // exclusive: A-only [0,2000)=2000, B-only ∅ overlapped... compute:
    // A∖(B∪C) = [0,2000) = 2000; B∖(A∪C) = [3000,4000) = 1000;
    // C∖(A∪B) = [4500,6000) = 1500
    val df = ((0L until 3000L).map(("A", _)) ++
      (2000L until 4500L).map(("B", _)) ++
      (4000L until 6000L).map(("C", _))).toDF("event_type", "user_id")
    val sk = Kmv.sketch(df, col("event_type"), col("user_id"), K)
    val se = sk.select(col("g"), explode(col("sk")).as("h"))
    val tot = se.select(col("h")).distinct()
      .agg(graft.functions.KmvSketchAgg(col("h"), K).as("skt"),
        count(lit(1)).as("nmt"))
    val Seq((skt, nmt)) = tot.as[(Seq[Long], Long)].collect().toSeq
    assert(nmt >= K, "θ regime requires the union past k")
    val theta = skt(K - 1)
    val estTotal = (K - 1).toDouble * Kmv.HashSpace / theta.toDouble
    val memb = tot.select(explode(col("skt")).as("ht"))
      .join(se, col("ht") === col("h"))
      .groupBy(col("ht"))
      .agg(count(lit(1)).as("ntypes"), min(col("g")).as("g1"))
    val rho = memb.filter(col("ntypes") === 1)
      .groupBy(col("g1")).agg(count(lit(1)).as("re"))
      .as[(String, Long)].collect().toMap
    val want = Map("A" -> 2000.0, "B" -> 1000.0, "C" -> 1500.0)
    want.foreach { case (g, truth) =>
      val est = rho.getOrElse(g, 0L).toDouble * estTotal / K.toDouble
      assert(math.abs(est - truth) / truth < 0.45,
        s"$g exclusive est $est vs truth $truth (3-RSE envelope on a " +
          s"~k/4 subsample)")
    }
  }

  test("segment_overlap at sf0.001 takes the exact path (all segments < k)") {
    val rows = SparkEntry.queries("segment_overlap")(spark, sf0001)
      .select("n_a", "n_b", "n_common_exact", "est_union", "est_intersect")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (na, nb, nc, estU, estI) =>
      assert(na < K && nb < K)
      assert(estU == (na + nb - nc).toDouble, "exact union below k")
      assert(estI == nc.toDouble, "exact intersection below k")
    }
  }
}
