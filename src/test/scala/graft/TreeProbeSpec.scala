package graft

import org.apache.spark.sql.functions._

import graft.ml.TreeProbe
import graft.ml.TreeProbe.{Split, Tree}

/** Deterministic histogram CART: exact recovery on a hand-checkable
  * fixture, bitwise partition-invariance (the property the hash oracle
  * rests on), bagging/feature-subset behavior, and the literal-scoring
  * contract. */
class TreeProbeSpec extends SparkSpec {
  import spark.implicits._

  // label = 1 iff x1 >= 0.5 — one split at the b1 boundary 3|4 separates
  // perfectly; x2 is uniform noise aligned to the bin grid
  private def separable = {
    val rows = for (i <- 0 until 16; j <- 0 until 16) yield {
      val x1 = i / 16.0; val x2 = j / 16.0
      (i * 16 + j, x1, x2, if (x1 >= 0.5) 1.0 else 0.0)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  test("separable fixture: root split lands on the true boundary, predictions exact") {
    val tree = TreeProbe.fit(separable, Seq("x1", "x2"), "y", depth = 2,
      weight = lit(1L), featSalt = None)
    val root = tree.splits.find(_.node == 1).get
    assert(root.f == 1 && root.t == 3,
      s"expected root split on x1 at bin 3, got $root")
    val leaf = TreeProbe.leafCol(tree, Seq("x1", "x2"), 2)
    val out = separable.withColumn("leaf", leaf)
      .withColumn("pred", TreeProbe.predCol(tree, col("leaf")))
    assert(out.filter(col("pred") =!= col("y").cast("int")).count() == 0,
      "a separable label must be predicted exactly")
  }

  test("tree is bit-identical under repartitioning (integer histogram argmin)") {
    val f = separable
    val a = TreeProbe.fit(f.repartition(13), Seq("x1", "x2"), "y", 3, lit(1L), None)
    val b = TreeProbe.fit(f.coalesce(1), Seq("x1", "x2"), "y", 3, lit(1L), None)
    assert(a == b, s"trees differ across partitionings:\n$a\n$b")
  }

  test("pure nodes stop splitting; unsplit nodes keep their id as leaf") {
    // constant label: every split has zero gain but identical cost, so the
    // argmin is still deterministic; predictions must all be the label
    val const = separable.withColumn("y", lit(1.0))
    val tree = TreeProbe.fit(const, Seq("x1", "x2"), "y", 2, lit(1L), None)
    assert(tree.leafPred.values.forall(_ == 1), s"pure corpus: $tree")
  }

  test("bootstrap weights: Poisson(1)-shaped counts, disjoint across trees") {
    val ids = (0 until 4096).toDF("id")
    val w = ids.select(TreeProbe.bootstrapWeight(col("id"), 1).as("w"))
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4096 draws: w=0 and w=1 each ≈ 36.8% (94/256), w=2 ≈ 18.4%
    assert(math.abs(w(0L) - 4096 * 94 / 256.0) < 150, s"w0 count ${w(0L)}")
    assert(math.abs(w(1L) - 4096 * 94 / 256.0) < 150, s"w1 count ${w(1L)}")
    // different trees resample independently: some rows in tree 1's bag
    // but not tree 2's
    val both = ids.select(
      TreeProbe.bootstrapWeight(col("id"), 1).as("w1"),
      TreeProbe.bootstrapWeight(col("id"), 2).as("w2"))
    assert(both.filter(col("w1") === 0 && col("w2") > 0).count() > 100)
  }

  test("feature subsets: md5-ranked 2-of-k, deterministic, node-varying") {
    val k = 4
    val a = TreeProbe.allowedFeatures(1, k, 2, "t1")
    assert(a == TreeProbe.allowedFeatures(1, k, 2, "t1"))
    assert(a.size == 2 && a == a.sorted && a.forall(f => f >= 1 && f <= k))
    // across nodes/salts the subset varies (not a fixed projection)
    val all = (1 to 16).map(n => TreeProbe.allowedFeatures(n, k, 2, "t1")).toSet ++
      (1 to 4).map(b => TreeProbe.allowedFeatures(1, k, 2, s"t$b")).toSet
    assert(all.size > 1, "md5 feature subsets never varied")
  }

  test("r14 batched fit: 4-at-once equals 4 single fits; derived leaf stats equal the direct aggregate") {
    val feats = graft.ml.RidgeProbe.qualityFeatures(
      graft.core.Tables.documents(spark, sfDir)).persist()
    val ws = (1 to 4).map(b => TreeProbe.bootstrapWeight(col("doc_id"), b))
    val salts = (1 to 4).map(b => Some(s"t$b"))
    val batched = TreeProbe.fitBatch(feats, Seq("x1", "x2", "x3"), "y",
      depth = 3, ws, salts)
    val single = (0 until 4).map(i => TreeProbe.fit(feats,
      Seq("x1", "x2", "x3"), "y", depth = 3, ws(i), salts(i)))
    assert(batched == single, "batched trees must equal per-tree fits")
    // derived leafPred vs the direct final-node aggregate the pre-r14
    // implementation executed as a separate job
    batched.zipWithIndex.foreach { case (tree, i) =>
      val leafStats = feats
        .withColumn("_w", ws(i).cast("long"))
        .withColumn("_yl", col("y").cast("long"))
        .withColumn("_node", TreeProbe.leafCol(tree, Seq("x1", "x2", "x3"), 3))
        .groupBy("_node")
        .agg(sum("_w").as("n"), sum(col("_w") * col("_yl")).as("p"))
        .collect()
        .map(r => r.getInt(0) ->
          (if (2 * r.getLong(2) > r.getLong(1)) 1 else 0)).toMap
      assert(tree.leafPred == leafStats,
        s"tree $i derived leaf stats diverge from the direct aggregate")
    }
    feats.unpersist(false)
  }

  test("forest on the quality label beats chance and trees disagree somewhere") {
    val feats = graft.ml.RidgeProbe.qualityFeatures(
      graft.core.Tables.documents(spark, sfDir))
    val xs = Seq("x1", "x2", "x3")
    val trees = (1 to 4).map { b =>
      TreeProbe.fit(feats, xs, "y", 3,
        TreeProbe.bootstrapWeight(col("doc_id"), b), Some(s"t$b"))
    }
    assert(trees.distinct.size > 1, "bootstrap must diversify the trees")
    val scored = trees.zipWithIndex.foldLeft(feats) { case (df, (t, i)) =>
      df.withColumn(s"p$i", TreeProbe.predCol(t, TreeProbe.leafCol(t, xs, 3)))
    }.withColumn("pred",
      when((0 until 4).map(i => col(s"p$i")).reduce(_ + _) >= 2, 1).otherwise(0))
    val n = scored.count()
    val acc = scored.filter(col("pred") === col("y").cast("int")).count().toDouble / n
    val base = math.max(
      scored.filter(col("y") === 1.0).count().toDouble / n,
      scored.filter(col("y") === 0.0).count().toDouble / n)
    assert(acc >= base, f"majority-class baseline $base%.3f not beaten: $acc%.3f")
  }
}
