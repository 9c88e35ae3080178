package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** L16 deterministic hash sampling: the property that motivates it —
  * the selected ROW SET is a pure function of (key, seed, rate),
  * invariant under repartitioning — plus rate calibration, stratified
  * rates, seed independence, and the nested-rate composition law. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("thresholdHex encodes floor(rate * 2^32) as 8 lowercase hex chars") {
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.1) == "19999999")
    assertThrows[IllegalArgumentException](Sampling.thresholdHex(0.0))
    assertThrows[IllegalArgumentException](Sampling.thresholdHex(1.0))
  }

  test("sample is deterministic and invariant under repartitioning") {
    val df = (1L to 4000L).toDF("k")
    val a = keys(Sampling.sampleHash(df, col("k"), 0.3, seed = 5))
    val b = keys(Sampling.sampleHash(df.repartition(17), col("k"), 0.3, seed = 5))
    val c = keys(Sampling.sampleHash(df.coalesce(1), col("k"), 0.3, seed = 5))
    assert(a == b && a == c)
    assert(a.nonEmpty && a.size < 4000)
  }

  test("sampled fraction lands near the nominal rate") {
    val df = (1L to 4000L).toDF("k")
    val n = Sampling.sampleHash(df, col("k"), 0.25, seed = 1).count()
    // md5 is uniform: 4000 draws at p=.25, ±5 sigma ≈ ±137
    assert(n > 863 && n < 1137, s"got $n of 4000 at rate 0.25")
  }

  test("different seeds select different sets; same seed re-selects") {
    val df = (1L to 2000L).toDF("k")
    val s1 = keys(Sampling.sampleHash(df, col("k"), 0.5, seed = 1))
    val s2 = keys(Sampling.sampleHash(df, col("k"), 0.5, seed = 2))
    val s1b = keys(Sampling.sampleHash(df, col("k"), 0.5, seed = 1))
    assert(s1 == s1b)
    assert(s1 != s2)
    // independent draws: overlap ≈ 25% of the population, nowhere near either set
    val overlap = (s1 & s2).size.toDouble / 2000
    assert(overlap > 0.15 && overlap < 0.35, s"overlap fraction $overlap")
  }

  test("same-seed nesting composes by MIN: 0.25-sample of a 0.5-sample == 0.25-sample") {
    val df = (1L to 2000L).toDF("k")
    val nested = keys(Sampling.sampleHash(
      Sampling.sampleHash(df, col("k"), 0.5, seed = 9), col("k"), 0.25, seed = 9))
    val direct = keys(Sampling.sampleHash(df, col("k"), 0.25, seed = 9))
    assert(nested == direct) // min(0.5, 0.25): thresholds nest, not multiply across same seed
    // and the order does not matter: the looser re-sample is a no-op
    val reversed = keys(Sampling.sampleHash(
      Sampling.sampleHash(df, col("k"), 0.25, seed = 9), col("k"), 0.5, seed = 9))
    assert(reversed == direct)
    // multiplicative thinning needs DIFFERENT seeds: 0.5 of 0.5 ≈ 0.25
    val twoSeeds = keys(Sampling.sampleHash(
      Sampling.sampleHash(df, col("k"), 0.5, seed = 9), col("k"), 0.5, seed = 10))
    assert(twoSeeds.size > 380 && twoSeeds.size < 620, s"independent thinning gave ${twoSeeds.size}")
  }

  test("rate 0 keeps nothing; rate 1 keeps everything") {
    val df = (1L to 100L).toDF("k")
    assert(Sampling.sampleHash(df, col("k"), 0.0).count() == 0)
    assert(Sampling.sampleHash(df, col("k"), 1.0).count() == 100)
  }

  test("stratified rates apply per stratum, default covers the rest") {
    val df = (1L to 6000L).map(k => (k, if (k % 3 == 0) "a" else if (k % 3 == 1) "b" else "c"))
      .toDF("k", "g")
    val out = Sampling.sampleStratified(df, col("k"), col("g"),
      rates = Map("a" -> 0.8, "b" -> 0.2), defaultRate = 0.0, seed = 3)
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 keys per stratum; ±5 sigma windows (sigma ≈ 18)
    assert(byG("a") > 1510 && byG("a") < 1690, s"stratum a: ${byG("a")}")
    assert(byG("b") > 310 && byG("b") < 490, s"stratum b: ${byG("b")}")
    assert(!byG.contains("c"), s"default rate 0 must drop stratum c entirely: $byG")
  }

  test("withSplit: proportions near weights, stable as the corpus grows") {
    val df = (1L to 4000L).toDF("k")
    val out = Sampling.withSplit(df, col("k"), "split",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 6)
    assert(out.count() == 4000L)
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet == Set("train", "val", "test"))
    assert(byS("train") > 3050 && byS("train") < 3350, s"train: ${byS("train")}")
    assert(byS("val") > 310 && byS("val") < 490, s"val: ${byS("val")}")
    // leakage guard: a doc keeps its split when the corpus doubles
    val grown = Sampling.withSplit((1L to 8000L).toDF("k"), col("k"), "split",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 6)
    val a = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = grown.where(col("k") <= 4000L).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("withSplit: weights summing below 1 send the remainder to the last split") {
    val df = (1L to 2000L).toDF("k")
    val out = Sampling.withSplit(df, col("k"), "split",
      Seq("a" -> 0.1, "b" -> 0.1), seed = 0)
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // b absorbs the unassigned 80%: ~1800 of 2000
    assert(byS("a") > 110 && byS("a") < 290, s"a: ${byS("a")}")
    assert(byS("b") > 1710 && byS("b") < 1890, s"b: ${byS("b")}")
    assertThrows[IllegalArgumentException](
      Sampling.withSplit(df, col("k"), "s", Seq("x" -> 0.9, "y" -> 0.2)))
    assertThrows[IllegalArgumentException](
      Sampling.withSplit(df, col("k"), "s", Seq.empty))
  }

  test("withSplitLeakageSafe: cluster members share one split; singletons match withSplit") {
    import spark.implicits._
    val df = (1L to 3000L).toDF("k")
    // 1..10 and 100..104 are two near-dup families
    val clusters = ((1L to 10L).map(_ -> 1L) ++ (100L to 104L).map(_ -> 100L))
      .toDF("id", "cluster_id")
    val out = Sampling.withSplitLeakageSafe(df, col("k"), clusters, "split",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 21)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every member of a family carries the family's (= min id's) split
    assert((1L to 10L).map(out).toSet.size == 1)
    assert((100L to 104L).map(out).toSet.size == 1)
    // singletons are IDENTICAL to plain withSplit — adding clusters
    // later only moves docs that gained duplicates
    val plain = Sampling.withSplit(df, col("k"), "split",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 21)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val singles = (1L to 3000L).filterNot(k => (k >= 1 && k <= 10) || (k >= 100 && k <= 104))
    assert(singles.forall(k => out(k) == plain(k)))
    assert(out(1L) == plain(1L), "the cluster rep IS its own key")
    // NULL ids still yield NULL splits
    val withNull = Seq(Some(7L), None).toDF("k")
    val n = Sampling.withSplitLeakageSafe(withNull, col("k"), clusters, "split",
      Seq("train" -> 1.0), seed = 21)
    assert(n.where(col("k").isNull).head().isNullAt(1))
  }

  test("exact-n: exactly min(n, |stratum|) rows per stratum, deterministic") {
    val df = (1L to 1000L).map(k => (k, if (k <= 900) "big" else if (k <= 990) "mid" else "tiny"))
      .toDF("k", "g")
    val out = Sampling.sampleExactPerStratum(df, col("k"), col("g"), n = 50, seed = 4)
    val byG = out.groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("big" -> 50L, "mid" -> 50L, "tiny" -> 10L))
    // invariant under repartitioning
    val again = Sampling.sampleExactPerStratum(df.repartition(11), col("k"), col("g"), 50, seed = 4)
    assert(out.select("k").collect().map(_.getLong(0)).toSet ==
      again.select("k").collect().map(_.getLong(0)).toSet)
  }

  test("exact-n: growing a stratum only displaces highest-draw survivors") {
    val small = (1L to 200L).map(k => (k, "s")).toDF("k", "g")
    val grown = (1L to 400L).map(k => (k, "s")).toDF("k", "g")
    val a = keys(Sampling.sampleExactPerStratum(small, col("k"), col("g"), 30, seed = 2)
      .select(col("k")))
    val b = keys(Sampling.sampleExactPerStratum(grown, col("k"), col("g"), 30, seed = 2)
      .select(col("k")))
    // every new survivor either was a survivor before or is a new key;
    // no old non-survivor with a HIGHER draw can displace a lower one —
    // equivalently, b restricted to 1..200 is a subset of a
    assert(b.filter(_ <= 200L).subsetOf(a))
  }

  test("exact-n: n=0 keeps nothing") {
    val df = (1L to 10L).map(k => (k, "x")).toDF("k", "g")
    assert(Sampling.sampleExactPerStratum(df, col("k"), col("g"), 0).count() == 0)
  }

  test("topKPerGroup: keeps the n best by score per group, ties by key, partition-invariant") {
    // scores collide (k % 5) so the key tie-break decides; group sizes
    // straddle n
    val df = (1L to 100L).map(k => (k, if (k <= 80) "big" else "small", (k % 5).toDouble))
      .toDF("k", "g", "score")
    val out = Sampling.topKPerGroup(df, col("k"), col("g"), col("score"), n = 30)
    val local = (1L to 100L).map(k => (k, if (k <= 80) "big" else "small", (k % 5).toDouble))
      .groupBy(_._2).flatMap { case (_, rows) =>
        rows.sortBy { case (k, _, s) => (-s, k) }.take(30)
      }.map(_._1).toSet
    assert(out.select("k").collect().map(_.getLong(0)).toSet == local)
    // small group (20 rows) keeps all 20
    assert(out.where(col("g") === "small").count() == 20L)
    val again = Sampling.topKPerGroup(df.repartition(13), col("k"), col("g"), col("score"), 30)
    assert(again.select("k").collect().map(_.getLong(0)).toSet == local)
  }

  test("topKPerGroup: NULL scores fill the budget only after every scored row") {
    val df = Seq((1L, "g", Some(1.0)), (2L, "g", None), (3L, "g", Some(5.0)), (4L, "g", None))
      .toDF("k", "g", "score")
    val top2 = Sampling.topKPerGroup(df, col("k"), col("g"), col("score"), 2)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(top2 == Set(1L, 3L)) // both scored rows beat both null-scored
    val top3 = Sampling.topKPerGroup(df, col("k"), col("g"), col("score"), 3)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(top3 == Set(1L, 3L, 2L)) // first null-scored by key tie-break
  }

  test("null keys: dropped by samplers, NULL split from withSplit — never a real label") {
    val df = (Seq((Some(1L), "x"), (Some(2L), "x"), (None, "x"), (None, "x")))
      .toDF("k", "g")
    assert(Sampling.sampleHash(df, col("k"), 0.99999, seed = 1).count() <= 2)
    // a null draw must not consume the exact-n budget nor rank first
    val ex = Sampling.sampleExactPerStratum(df, col("k"), col("g"), n = 3)
    assert(ex.collect().forall(!_.isNullAt(0)))
    assert(ex.count() == 2)
    val sp = Sampling.withSplit(df, col("k"), "split", Seq("train" -> 0.5, "test" -> 0.5))
      .collect().map(r => Option(r.get(0)) -> r.getAs[String]("split"))
    sp.foreach { case (k, s) =>
      if (k.isEmpty) assert(s == null, "null key must get a NULL split, not the last label")
      else assert(s == "train" || s == "test")
    }
  }

  test("same key+seed decides identically across tables (aligned samples)") {
    val left = (1L to 1000L).toDF("k")
    val right = (501L to 1500L).toDF("k")
    val a = keys(Sampling.sampleHash(left, col("k"), 0.4, seed = 11))
    val b = keys(Sampling.sampleHash(right, col("k"), 0.4, seed = 11))
    // on the shared key range the decisions are identical
    assert(a.filter(_ >= 501L) == b.filter(_ <= 1000L))
  }

  // -------------------------------------------------------- L26 diversity
  /** Hand-made unit centroids (the SemDedupSpec pattern): assignment is
    * exact by construction, so the cap semantics cannot hinge on
    * k-means initialization luck. */
  private val axes: Array[Array[Double]] = Array(
    Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 1.0, 0.0, 0.0))

  private def embRows: Seq[Emb] =
    // dense cluster on axis 0 (6 vectors), medium on axis 2 (3), lone axis 1
    (1L to 6L).map(i => Emb(i, Seq(1f, i.toFloat / 100, 0f, 0f))) ++
    (7L to 9L).map(i => Emb(i, Seq(0f, 0f, 1f, i.toFloat / 100))) :+
    Emb(10L, Seq(0f, 1f, 0f, 0f))

  test("sampleDiverseByCluster caps every cell at n; dense mode no longer dominates") {
    val e = Tio.fromRows(spark, SemEmbs, embRows).toNative
    val out = Sampling.sampleDiverseByCluster(axes, e, col("vec_id"), col("embedding"),
      nPerCluster = 2, seed = 3)
    val byCell = out.collect().groupBy(_.getAs[Int]("cid")).view.mapValues(_.length).toMap
    // dense cell capped at 2, medium at 2, lone cell keeps its 1
    assert(byCell.values.toSeq.sorted == Seq(1, 2, 2))
    // the draw is the sampleExactPerStratum hash order on the assignment
    val assigned = graft.operators.Ann.assignClusters(axes, e, col("vec_id"), col("embedding"))
    val expect = Sampling.sampleExactPerStratum(assigned, col("id"), col("cid"), 2, seed = 3)
      .collect().map(_.getAs[Long]("id")).toSet
    assert(out.collect().map(_.getAs[Long]("id")).toSet == expect)
  }

  test("sampleDiverseByCluster is partition-independent and drops unusable vectors") {
    val rows = embRows :+ Emb(11L, Seq(Float.NaN, Float.NaN, Float.NaN, Float.NaN))
    val e = Tio.fromRows(spark, SemEmbs, rows).toNative
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.sampleDiverseByCluster(axes, df, col("vec_id"), col("embedding"),
        nPerCluster = 2, seed = 3).collect().map(_.getAs[Long]("id")).toSet
    val one = ids(e.repartition(1))
    val many = ids(e.repartition(13))
    assert(one == many)
    assert(!one.contains(11L)) // all-NaN vector has no cell: dropped
    assert(Sampling.sampleDiverseByCluster(axes, e, col("vec_id"), col("embedding"),
      nPerCluster = 0).count() == 0L)
  }

  object SemEmbs extends GSchema {
    val vec_id    = col[Long]("vec_id")
    val embedding = col[Seq[Float]]("embedding")
  }

  // ----------------------------------------------------- L27 shuffle
  test("shuffleShards: deterministic, partition-invariant, near-uniform, growth-stable") {
    val df = (1L to 4000L).toDF("k")
    def shards(d: org.apache.spark.sql.DataFrame) =
      Sampling.shuffleShards(d, col("k"), nShards = 8, seed = 2)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("shard")).toMap
    val m1 = shards(df)
    assert(m1 == shards(df.repartition(17)))
    val sizes = m1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.forall(s => s > 350 && s < 650), s"skewed shards: $sizes")
    // a row's shard never moves when the corpus grows (resume safety)
    val grown = shards((1L to 8000L).toDF("k"))
    assert(m1.forall { case (k, s) => grown(k) == s })
    // null keys cannot place deterministically: dropped
    val withNull = Seq(Some(1L), None).toDF("k")
    assert(Sampling.shuffleShards(withNull, col("k"), 8).count() == 1L)
  }

  test("shuffled: per-task runs are (shard, draw)-ordered; an ordered input decorrelates") {
    val df = (1L to 2000L).toDF("k")
    val out = Sampling.shuffled(df, col("k"), nShards = 4, seed = 1)
    assert(out.rdd.getNumPartitions == 4)
    val parts = out.select("shard", "draw", "k").rdd.glom().collect()
    parts.filter(_.nonEmpty).foreach { rows =>
      val keys = rows.map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(keys == keys.sorted, "partition not in (shard, draw) order")
    }
    // the within-shard key sequence is decorrelated from the input order:
    // a sorted input must not come back monotone
    val firstShard = out.where(col("shard") === 0L).collect().map(_.getAs[Long]("k"))
    assert(firstShard.length > 100)
    assert(!firstShard.sameElements(firstShard.sorted), "shuffle left the input ordered")
    // same multiset in = same multiset out
    assert(out.select("k").collect().map(_.getLong(0)).sorted.toSeq == (1L to 2000L).toSeq)
  }

  // -------------------------------------------- L28 temperature mixture
  test("temperatureRates: alpha=1 is proportional, alpha=0 equalizes, small groups clamp") {
    val counts = Map("a" -> 9000L, "b" -> 900L, "c" -> 100L)
    // alpha=1: every group keeps the SAME rate T/N (natural proportions)
    val r1 = Sampling.temperatureRates(counts, alpha = 1.0, targetCount = 1000)
    assert(r1.values.toSet.size == 1)
    assert(math.abs(r1("a") - 1000.0 / 10000.0) < 1e-9)
    // alpha=0: equal PER-GROUP budgets T/G -> rate_s = T/(G*n_s)
    val r0 = Sampling.temperatureRates(counts, alpha = 0.0, targetCount = 300)
    assert(math.abs(r0("a") - 100.0 / 9000.0) < 1e-9)
    assert(math.abs(r0("c") - 1.0) < 1e-9) // 100-doc group asked for 100 docs
    // a rate past 1 clamps (tiny group, big target)
    val rc = Sampling.temperatureRates(counts, alpha = 0.0, targetCount = 3000)
    assert(rc("c") == 1.0)
    // intermediate alpha lands between the two regimes for the tail group
    val rm = Sampling.temperatureRates(counts, alpha = 0.5, targetCount = 1000)
    assert(rm("c") > r1("c") && rm("c") <= 1.0)
    assertThrows[IllegalArgumentException](Sampling.temperatureRates(counts, -0.1, 10))
    assertThrows[IllegalArgumentException](Sampling.temperatureRates(Map("a" -> 0L), 0.5, 10))
  }

  test("sampleTemperature: deterministic, partition-invariant, null-group drop, near-target") {
    val df = (1L to 3000L).map(k => (k, if (k <= 2400) "big" else "small")).toDF("k", "g")
    def kept(d: org.apache.spark.sql.DataFrame) =
      Sampling.sampleTemperature(d, col("k"), col("g"), alpha = 0.5, targetCount = 600, seed = 3)
        .select("k").collect().map(_.getLong(0)).toSet
    val a = kept(df)
    assert(a == kept(df.repartition(13)))
    // expected kept ~= targetCount (Bernoulli: 600 +- 5 sigma ~ +-120)
    assert(a.size > 480 && a.size < 720, s"kept ${a.size} of target 600")
    // alpha=0.5 up-weights the tail: small keeps MORE than its natural share
    val small = a.count(_ > 2400)
    assert(small.toDouble / a.size > 600.0 / 3000.0, s"tail share $small/${a.size}")
    // null groups drop; empty input yields empty output, no crash
    val withNull = Seq((1L, Some("g")), (2L, None)).toDF("k", "g")
    assert(Sampling.sampleTemperature(withNull, col("k"), col("g"), 0.5, 10).count() <= 1)
    assert(Sampling.sampleTemperature(df.where(lit(false)), col("k"), col("g"), 0.5, 10).count() == 0)
  }

  test("importance: constant rate matches sampleHash exactly (same draw, same threshold)") {
    val d = (1L to 2000L).toDF("k")
    val a = Sampling.sampleHash(d, col("k"), 0.3, seed = 5).as[Long].collect().toSet
    val b = Sampling.sampleImportance(d, col("k"), lit(0.3), seed = 5).as[Long].collect().toSet
    assert(a == b)
  }

  test("importance: rate >= 1 keeps, <= 0 drops, NULL drops; clamps out-of-range") {
    val d = Seq((1L, Some(2.0)), (2L, Some(-1.0)), (3L, None), (4L, Some(1.0)))
      .toDF("k", "r")
    val kept = Sampling.sampleImportance(d, col("k"), col("r"), seed = 1)
      .select("k").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("importance: per-row rates calibrate — high-rate rows survive more often") {
    val d = (1L to 4000L).toDF("k")
      .withColumn("r", when(col("k") <= 2000L, 0.8).otherwise(0.1))
    val kept = Sampling.sampleImportance(d, col("k"), col("r"), seed = 2)
    val hi = kept.where(col("k") <= 2000L).count()
    val lo = kept.where(col("k") > 2000L).count()
    assert(math.abs(hi - 1600L) < 120, s"hi $hi")   // ~0.8 * 2000
    assert(math.abs(lo - 200L) < 80, s"lo $lo")     // ~0.1 * 2000
    // deterministic + partition-invariant
    val again = Sampling.sampleImportance(d.repartition(13), col("k"), col("r"), seed = 2)
      .select("k").as[Long].collect().toSet
    assert(again == kept.select("k").as[Long].collect().toSet)
  }

  // ------------------------------------------------------ L49 interleave

  test("interleaveByWeight: every prefix carries sources in weight proportion") {
    import spark.implicits._
    val d = ((1L to 90L).map(i => (i, "a")) ++ (101L to 130L).map(i => (i, "b")))
      .toDF("k", "g")
    val ord = Sampling.interleaveByWeight(d, col("k"), col("g"), Map("a" -> 3.0, "b" -> 1.0))
      .orderBy("mix_order")
      .select("g").as[String].collect().toSeq
    assert(ord.size == 120)
    // stride schedule: group g's count in the first n rows is within
    // one emission slot of proportional — |#a - 3*#b| bounded
    for (n <- Seq(4, 8, 20, 40, 80, 120)) {
      val (na, nb) = (ord.take(n).count(_ == "a"), ord.take(n).count(_ == "b"))
      assert(math.abs(na - 3 * nb) <= 3, s"prefix $n: a=$na b=$nb")
    }
  }

  test("interleaveByWeight: unweighted groups and NULL keys drop; schedule is partition-invariant") {
    import spark.implicits._
    val d = Seq((Some(1L), "a"), (Some(2L), "a"), (Some(3L), "c"),
      (None: Option[Long], "a"), (Some(4L), "b"))
      .toDF("k", "g")
    val out = Sampling.interleaveByWeight(d, col("k"), col("g"), Map("a" -> 2.0, "b" -> 1.0))
      .select("k", "mix_order")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L, 4L)) // c unweighted, NULL key dropped
    assert(out(4L) == 0.5)                // b's first emission at (1-0.5)/1
    val repart = Sampling.interleaveByWeight(
        d.repartition(7), col("k"), col("g"), Map("a" -> 2.0, "b" -> 1.0))
      .select("k", "mix_order")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(repart == out)
  }
}
