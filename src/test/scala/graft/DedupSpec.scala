package graft

import graft.dedup.Dedup

/** Behavior the oracle gate can't exercise at test SF: the boilerplate
  * bucket-size guard. A signature shared by a huge block of template text
  * explodes quadratically in candidate pairs; buckets above `maxBucket`
  * must be dropped while genuine near-dups keep flowing.
  */
class DedupSpec extends SparkSpec {

  test("minhash candidates drop boilerplate buckets above the cap") {
    import spark.implicits._
    val boiler = (0 until 200).map(i =>
      (i.toLong, "terms of service apply to all content on this site every day"))
    val near = Seq(
      (1000L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (1001L, "the quick brown fox jumps over the lazy dog near the river bank"))
    val docs = (boiler ++ near).toDF("doc_id", "text")
    val capped = Dedup.minhashCandidates(
      Dedup.minhashSignatures(docs), maxBucket = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1000L, 1001L)),
      s"near-dup pair must survive the cap, got $capped")
    assert(capped.forall { case (a, _) => a >= 1000L },
      s"boilerplate pairs leaked through the cap: ${capped.size}")
    // uncapped, the 200-doc bucket floods ~20k candidate pairs
    val flood = Dedup.minhashCandidates(Dedup.minhashSignatures(docs)).count()
    assert(flood > 10000L, s"expected boilerplate flood, got $flood")
  }

  test("components: distributed fixpoint equals driver union-find (random graphs)") {
    // The hybrid finish means production runs take ONE of two exact
    // algorithms depending on edge volume. Pin them against each other on
    // randomized graphs: threshold 0 forces the all-distributed
    // star-contraction path, the default takes the local union-find path —
    // identical (node -> component-min) labels required, plus a chain
    // graph whose diameter punishes anything label-propagation-shaped.
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val cases = Seq(
      // sparse random: many small components
      (0 until 400).map(_ => (rng.nextInt(300).toLong, rng.nextInt(300).toLong)),
      // one long chain (diameter = n)
      (0 until 200).map(i => (i.toLong, (i + 1).toLong)),
      // two dense blobs joined by one bridge edge
      (0 until 300).map(_ => (rng.nextInt(50).toLong, rng.nextInt(50).toLong)) ++
        (0 until 300).map(_ => (100L + rng.nextInt(50), 100L + rng.nextInt(50))) ++
        Seq((49L, 100L)))
    cases.zipWithIndex.foreach { case (edges, ci) =>
      val pairs = edges.toDF("doc_a", "doc_b")
      val dist = Dedup.components(pairs, localThreshold = 0L)
        .collect().toMap
      val local = Dedup.components(pairs, localThreshold = Long.MaxValue)
        .collect().toMap
      assert(dist == local,
        s"case $ci: distributed and local labels diverge " +
          s"(${dist.size} vs ${local.size} nodes)")
      // labels are component minima: every label labels itself
      assert(local.forall { case (_, m) => local(m) == m },
        s"case $ci: a label is not its own component minimum")
    }
  }

  test("jaccardDense matches jaccard (broadcast vs semi-join regime)") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(150)
    val t = split(col("text"), " ")
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 5, lit(3))))
        .as("text")))
    val cand = Dedup.minhashCandidates(Dedup.minhashSignatures(corpus))
      .select("doc_a", "doc_b")
    val a = Dedup.jaccard(corpus, cand)
    val b = Dedup.jaccardDense(corpus, cand)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "dense-regime jaccard diverges from the broadcast form")
    assert(a.count() > 0, "no pairs verified — fixture broke")
    // jaccardAuto lands on the same rows in BOTH regimes: densePairs=1
    // forces the dense plan, the default keeps broadcast on this fixture
    val auto = Dedup.jaccardAuto(corpus, cand)
    val forced = Dedup.jaccardAuto(corpus, cand, densePairs = 1L)
    assert(auto.exceptAll(a).isEmpty && a.exceptAll(auto).isEmpty,
      "auto (broadcast regime) diverges")
    assert(forced.exceptAll(a).isEmpty && a.exceptAll(forced).isEmpty,
      "auto (forced dense regime) diverges")
  }

  test("containmentAuto matches containment in both regimes") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(150)
    val t = split(col("text"), " ")
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 5, lit(3))))
        .as("text")))
    val cand = Dedup.minhashCandidates(Dedup.minhashSignatures(corpus))
      .select("doc_a", "doc_b")
    val a = Dedup.containment(corpus, cand)
    assert(a.count() > 0, "no pairs verified — fixture broke")
    // auto default (broadcast regime on this fixture) and forced dense
    // (densePairs=1) must both land on the broadcast form's exact rows
    val auto = Dedup.containmentAuto(corpus, cand)
    val forced = Dedup.containmentAuto(corpus, cand, densePairs = 1L)
    assert(auto.exceptAll(a).isEmpty && a.exceptAll(auto).isEmpty,
      "containmentAuto (broadcast regime) diverges")
    assert(forced.exceptAll(a).isEmpty && a.exceptAll(forced).isEmpty,
      "containmentAuto (forced dense regime) diverges")
  }

  test("keepBest: one survivor per cluster, and quality outranks min-id") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(150)
    val t = split(col("text"), " ")
    // base ∪ truncated variant at a LOWER doc_id: min-id resolution would
    // keep the truncation; keep-best must keep the longer base document
    val corpus = docs.filter(size(t) >= 30).unionByName(docs
      .filter(size(t) >= 30)
      .select((col("doc_id") - 1000000).as("doc_id"),
        concat_ws(" ", slice(t, lit(1), size(t) - 8)).as("text")))
    val quality = size(split(col("text"), " ")).cast("double")
    val res = Dedup.keepBest(corpus, quality).cache()
    // exactly one kept member per cluster
    val perCluster = res.groupBy("cluster")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("nk"))
      .filter(col("nk") =!= 1).count()
    assert(perCluster == 0, "a cluster kept != 1 member")
    // in every multi-member cluster the winner is the max-quality member
    val bad = res.as("a").join(res.as("b"),
      col("a.cluster") === col("b.cluster") &&
        col("a.kept") && !col("b.kept") &&
        col("a.quality") < col("b.quality")).count()
    assert(bad == 0, "a kept member is outranked by a dropped one")
    // the fixture actually exercises the policy: some kept doc_id is NOT
    // the cluster minimum (the truncated copy sits at the smaller id)
    val nonMin = res.filter(col("kept") && col("doc_id") =!= col("cluster"))
      .count()
    assert(nonMin > 0, "keep-best never diverged from min-id — fixture weak")
    res.unpersist()
  }

  test("leakSafeSplit: splits are cluster-coordinated and exhaustive") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(200)
    val t = split(col("text"), " ")
    val corpus = docs.unionByName(docs.select(
      (col("doc_id") + 100000).as("doc_id"),
      concat_ws(" ", slice(t, lit(1), greatest(size(t) - 5, lit(3))))
        .as("text")))
    val res = Dedup.leakSafeSplit(corpus).cache()
    // every doc assigned exactly once
    assert(res.count() == corpus.count(), "a document lost its assignment")
    // no cluster straddles two splits — the leakage guarantee itself
    val mixed = res.groupBy("cluster")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(mixed == 0, "a duplicate cluster straddles splits")
    // the truncated mirror always rides with its base document
    val straddle = res.as("a").join(res.as("b"),
      col("a.doc_id") + 100000 === col("b.doc_id") &&
        col("a.split") =!= col("b.split")).count()
    assert(straddle == 0, "a near-dup variant landed in a different split")
    // the 80/10/10 cut is roughly honored (hash mod 100 on ~200 clusters)
    val bySplit = res.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"missing split bucket: $bySplit")
    assert(bySplit("train") > bySplit("val") &&
      bySplit("train") > bySplit("test"),
      s"train is not the majority split: $bySplit")
    res.unpersist()
  }

  test("embedding near-dup buckets above the cap are dropped") {
    import spark.implicits._
    val same = (0 until 100).map(i =>
      (i.toLong, Array.tabulate(64)(j => (j + 1).toFloat)))
    val embs = same.toDF("vec_id", "embedding")
    assert(Dedup.embeddingNearDups(embs, maxBucket = 50).count() == 0)
    assert(Dedup.embeddingNearDups(embs, maxBucket = 1024).count() > 0)
  }

  test("span removal cuts exactly the shared window, nothing else") {
    import spark.implicits._
    // docs 0 and 1 share one 4-token window ("c d e f") mid-text;
    // doc 2 shares nothing; doc 3 repeats a window only WITHIN itself
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x y c d e f z w"),
      (2L, "p q r s t u v"),
      (3L, "m n o k m n o k m n o k")).toDF("doc_id", "text")
    val r = Dedup.removeDupSpans(docs, w = 4).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("n_removed"), x.getAs[String]("clean_text"))).toMap
    // the window covers tokens 3..6 (start 3, width 4) in both carriers
    assert(r(0L) == (4, "a b g h"))
    assert(r(1L) == (4, "x y z w"))
    // untouched doc round-trips verbatim
    assert(r(2L) == (0, "p q r s t u v"))
    // within-doc repetition is not a CROSS-document duplicate
    assert(r(3L)._1 == 0)
  }

  test("span removal: overlapping dup windows merge their coverage") {
    import spark.implicits._
    // both docs share two OVERLAPPING 4-windows ("b c d e", "c d e f"):
    // coverage is their union (tokens 2..7), not double-counted
    val docs = Seq(
      (0L, "a b c d e f g"),
      (1L, "z b c d e f y")).toDF("doc_id", "text")
    val r = Dedup.removeDupSpans(docs, w = 4).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Int]("n_removed"), x.getAs[String]("clean_text"))).toMap
    assert(r(0L) == (5, "a g"))
    assert(r(1L) == (5, "z y"))
  }

  test("star candidate graph: components identical to the all-pairs clique") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // real docs + two truncation variants = chained near-dup clusters,
    // plus a boilerplate block that must stay capped out of both graphs
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(80)
    val t = split(col("text"), " ")
    val corpus = docs
      .unionByName(docs.select((col("doc_id") + 100000).as("doc_id"),
        concat_ws(" ", slice(t, lit(1), greatest(size(t) - 5, lit(3)))).as("text")))
      .unionByName(docs.select((col("doc_id") + 200000).as("doc_id"),
        concat_ws(" ", slice(t, lit(1), greatest(size(t) - 10, lit(3)))).as("text")))
    val sigs = Dedup.minhashSignatures(corpus).cache()
    val viaClique = Dedup.resolveClusters(
      Dedup.minhashCandidates(sigs).select("doc_a", "doc_b"))
    val viaStar = Dedup.resolveClusters(Dedup.minhashStarEdges(sigs))
    assert(viaStar.exceptAll(viaClique).isEmpty &&
      viaClique.exceptAll(viaStar).isEmpty,
      "star edges changed the component structure")
    // and the star graph is actually smaller on this duplicate-dense corpus
    val nClique = Dedup.minhashCandidates(sigs).count()
    val nStar = Dedup.minhashStarEdges(sigs).count()
    assert(nStar <= nClique, s"star=$nStar clique=$nClique")
    sigs.unpersist()
  }

  test("containment flags a full quote that Jaccard under-rates") {
    import spark.implicits._
    val long = (0 until 80).map(i => s"w$i").mkString(" ")
    val quote = (0 until 20).map(i => s"w$i").mkString(" ") // 25% of long
    val docs = Seq((1L, long), (2L, quote)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containment(docs, pairs).head()
    // quote's 17 shingles all inside long's 77
    assert(r.getAs[Double]("contain_ba") == 1.0, "quote fully contained")
    assert(r.getAs[Double]("jaccard") < 0.5,
      "jaccard alone would miss this pair")
    assert(r.getAs[Int]("n_inter") == 17)
    // below-threshold overlap in BOTH directions yields no row
    val disjoint = Seq((3L, (80 until 160).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.containment(docs.unionByName(disjoint),
      Seq((1L, 3L)).toDF("doc_a", "doc_b")).count() == 0)
  }

  test("novelty: later copies score 0, first carriers score 1, mixes in between") {
    import spark.implicits._
    val base = "a b c d e f g h i j"
    val docs = Seq(
      (0L, base),                    // first carrier of everything it has
      (1L, base),                    // verbatim later copy → novelty 0
      (2L, "p q r s t u v w x y"),   // disjoint → novelty 1
      (3L, "a b c d e f p2 q2 r2 s2 t2 u2 v2") // half old, half new
    ).toDF("doc_id", "text")
    val r = Dedup.noveltyScores(docs, w = 4).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("n_seen"),
         x.getAs[Double]("novelty"))).toMap
    assert(r(0L) == (7L, 0L, 1.0))
    assert(r(1L) == (7L, 7L, 0.0))
    assert(r(2L) == (7L, 0L, 1.0))
    // doc 3: 10 grams, 3 of them ("a b c d".."c d e f") first seen in doc 0
    assert(r(3L) == (10L, 3L, 0.7))
  }

  test("source overlap: identical sources estimate J=1, disjoint J=0") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"v$i").mkString(" ")
    val docs = Seq(
      (1L, "twinA", text), (2L, "twinB", text), // identical shingle sets
      (3L, "alien", other)                      // disjoint from both
    ).toDF("doc_id", "source", "text")
    val m = Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // identical sets: every component min matches, truth = 1
    assert(m(("twinA", "twinB")) == ((16L, 1.0, 1.0)))
    // disjoint sets: md5 collisions aside, no component matches, truth 0
    assert(m(("alien", "twinA"))._1 == 0L && m(("alien", "twinA"))._3 == 0.0)
    assert(m(("alien", "twinB"))._2 == 0.0)
  }

  test("ensemble: verdict requires two signals, jaccard implies minhash") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val variants = docs.map { case (id, t) =>
      (id + 100000L, t.split(" ").dropRight(3).mkString(" "))
    }
    val r = Dedup.dedupEnsemble((docs ++ variants).toDF("doc_id", "text"))
      .collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val nb = row.getAs[Long]("n_bands")
      val hm = row.getAs[Int]("hamming")
      val jc = row.getAs[Double]("jaccard")
      val ns = row.getAs[Int]("n_signals")
      val v = row.getAs[Boolean]("verdict")
      // signal count = the non-sentinel evidence present
      val expect = (if (nb > 0) 1 else 0) + (if (hm >= 0) 1 else 0) +
        (if (jc > 0.0) 1 else 0)
      assert(ns == expect && v == (ns >= 2), s"row $row")
      // jaccard verification only runs on minhash candidates
      if (jc > 0.0) assert(nb > 0, s"jaccard without minhash: $row")
    }
    // the variant pairs produce full three-signal agreement somewhere
    assert(r.exists(_.getAs[Int]("n_signals") == 3),
      "no pair carried all three signals on the variant corpus")
  }

  test("banded-Hamming simhash: complete and exact vs brute force at d<=3") {
    import spark.implicits._
    // variant-chained corpus: base docs + one-word and three-word edits
    val base = (0 until 30).map { i =>
      (i.toLong,
        (0 until 40).map(k => s"tok${(i * 7 + k * 3) % 60}").mkString(" "))
    }
    val edited = base.map { case (id, t) =>
      (id + 100L, t.split(" ").drop(2).mkString(" "))
    }
    val docs = (base ++ edited).toDF("doc_id", "text")
    val got = Dedup.simhashHammingPairs(docs, maxDist = 3)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)]
      .collect().map { case (a, b, h) => (a, b) -> h }.toMap
    // brute force over the full 64-bit signatures
    val sigs = Dedup.simhashBlockSigs(docs)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map { case (id, b0, b1, b2, b3) => id -> Array(b0, b1, b2, b3) }
      .toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = (0 until 4).map(i =>
        Integer.bitCount(sigs(a)(i) ^ sigs(b)(i))).sum
      if h <= 3
    } yield (a, b) -> h).toMap
    // pigeonhole completeness: every true d<=3 pair found, none invented,
    // distances exact
    assert(got == brute,
      s"banded join diverges from brute force: got ${got.size}, " +
        s"true ${brute.size}")
    assert(brute.nonEmpty, "fixture must contain close pairs")
    // a verbatim duplicate sits at distance 0
    val twin = Seq((500L, base.head._2), (501L, base.head._2))
      .toDF("doc_id", "text")
    val zero = Dedup.simhashHammingPairs(twin).as[(Long, Long, Int, Int)]
      .collect()
    assert(zero.toSeq == Seq((500L, 501L, 0, 4)))
  }

  test("lsh plan: S-curve expectations over a pinned pair distribution") {
    import spark.implicits._
    // one near-dup pair (j=0.9) and one low-sim pair (j=0.2), threshold .5
    val scored = Seq((1L, 2L, 0.9), (3L, 4L, 0.2))
      .toDF("doc_a", "doc_b", "jaccard")
    val plan = Dedup.lshPlan(scored, threshold = 0.5)
      .collect().map(r => (r.getAs[Int]("bands"), r.getAs[Int]("rows_per_band")) ->
        (r.getAs[Double]("exp_dup_recall"), r.getAs[Double]("exp_sub_suppression"),
         r.getAs[Double]("threshold_approx"), r.getAs[Long]("n_dup_pairs"),
         r.getAs[Long]("n_sub_pairs"))).toMap
    assert(plan.keySet == Dedup.lshPlanGrid.toSet)
    plan.values.foreach { case (_, _, _, nd, ns) =>
      assert(nd == 1L && ns == 1L)
    }
    // hand-computed (2,2): p(.9)=1-(1-.81)^2=.9639; p(.2)=1-(1-.04)^2=.0784
    val (rec22, sup22, _, _, _) = plan((2, 2))
    assert(rec22 == 0.9639 && sup22 == 0.9216)
    // recall rises with bands at fixed rows; suppression falls
    val (rec42, sup42, t42, _, _) = plan((4, 2))
    assert(rec42 > rec22 && sup42 < sup22)
    // (1/4)^(1/2) and (1/16)^(1/4) are exactly 0.5 on the rnd4 grid
    assert(t42 == 0.5 && plan((16, 4))._3 == 0.5)
    // at (8,4) a 0.9-Jaccard pair collides ~surely
    assert(plan((8, 4))._1 >= 0.999)
    // no-dup degenerate: recall pinned 0, counts right
    val none = Dedup.lshPlan(
      Seq((1L, 2L, 0.1)).toDF("doc_a", "doc_b", "jaccard"), threshold = 0.5)
      .collect()
    assert(none.forall(r => r.getAs[Double]("exp_dup_recall") == 0.0 &&
      r.getAs[Long]("n_dup_pairs") == 0L))
  }
}
