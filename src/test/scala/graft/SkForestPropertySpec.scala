package graft

import org.apache.spark.sql.functions._

import graft.ml.SkForest

/** Seeded-random property check for the sklearn-forest scorer: for many
  * random forests (class counts 2..13, random tree shapes, engineered
  * probability ties and on-threshold feature values) the Spark literal
  * CASE-chain scoring must equal a pure-Scala reference traversal
  * BIT-FOR-BIT — same tree-order left-associative sum, one division,
  * numpy first-maximal-index argmax. Fixture specs pin known answers;
  * this pins the scorer over the shape space a real converted model can
  * occupy.
  */
class SkForestPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)

  private def randomTree(depth: Int, nClasses: Int): SkForest.Tree = {
    val nodes = scala.collection.mutable.ArrayBuffer.empty[SkForest.Node]
    def build(d: Int): Int = {
      val idx = nodes.length
      val isLeaf = d >= depth || rnd.nextInt(3) == 0
      if (isLeaf) {
        // converter-style: integer counts normalized by one double division
        val counts = Array.fill(nClasses)(rnd.nextInt(20))
        if (counts.sum == 0) counts(rnd.nextInt(nClasses)) = 1
        // engineered exact ties: sometimes two classes share the count
        if (rnd.nextInt(3) == 0 && nClasses >= 2) {
          val a = rnd.nextInt(nClasses); val b = rnd.nextInt(nClasses)
          counts(b) = counts(a)
        }
        val total = counts.sum.toDouble
        nodes += SkForest.Node(-1, -1, -1, Double.NaN,
          counts.map(_ / total).toIndexedSeq)
        idx
      } else {
        nodes += null // placeholder; children indices known after recursion
        val f = rnd.nextInt(3)
        val t = math.floor(rnd.nextDouble() * 10000) / 10000
        val l = build(d + 1)
        val r = build(d + 1)
        nodes(idx) = SkForest.Node(l, r, f, t, IndexedSeq.empty)
        idx
      }
    }
    build(0)
    SkForest.Tree(nodes.toIndexedSeq)
  }

  /** Pure-Scala reference: same double DAG as probCol/predictCol. */
  private def refScore(f: SkForest.Forest,
                       xs: Array[Double]): (Array[Double], Double) = {
    def leafProb(t: SkForest.Tree, c: Int): Double = {
      var i = 0
      while (t.nodes(i).l >= 0) {
        val n = t.nodes(i)
        i = if (xs(n.f) <= n.t) n.l else n.r
      }
      t.nodes(i).probs(c)
    }
    val probs = f.classes.indices.map { c =>
      var s = 0.0
      f.trees.foreach(t => s += leafProb(t, c)) // tree order, left-assoc
      s / f.trees.size.toDouble
    }.toArray
    var best = probs(0); var bi = 0
    var i = 1
    while (i < probs.length) { // strictly greater = first maximal wins
      if (probs(i) > best) { best = probs(i); bi = i }
      i += 1
    }
    (probs, f.classes(bi))
  }

  test("random forests: Spark scoring equals the reference bit-for-bit " +
       "(15 forests x 20 rows, ties and on-threshold values included)") {
    for (_ <- 1 to 15) {
      val nClasses = 2 + rnd.nextInt(12)
      val nTrees = 1 + rnd.nextInt(4)
      val forest = SkForest.Forest(
        nFeatures = 3,
        classes = IndexedSeq.tabulate(nClasses)(_.toDouble),
        trees = IndexedSeq.fill(nTrees)(randomTree(1 + rnd.nextInt(3),
          nClasses)))
      val thresholds = forest.trees
        .flatMap(_.nodes.filter(_.l >= 0).map(_.t))
      val rows = (1 to 20).map { id =>
        def feat(): Double =
          // sometimes land EXACTLY on a split threshold (x<=t goes left)
          if (thresholds.nonEmpty && rnd.nextInt(4) == 0)
            thresholds(rnd.nextInt(thresholds.size))
          else math.floor(rnd.nextDouble() * 10000) / 10000
        (id.toLong, feat(), feat(), feat())
      }
      val df = spark.createDataFrame(rows).toDF("id", "x1", "x2", "x3")
      val xs = Seq(col("x1"), col("x2"), col("x3"))
      val scored = forest.classes.indices.foldLeft(df) { (acc, c) =>
        acc.withColumn(s"p$c", SkForest.probCol(forest, c, xs))
      }
      val ps = forest.classes.indices.map(c => col(s"p$c"))
      val got = scored.withColumn("pred", SkForest.predictCol(forest, ps))
        .orderBy("id").collect()
      rows.zip(got).foreach { case ((_, x1, x2, x3), row) =>
        val (expProbs, expPred) = refScore(forest, Array(x1, x2, x3))
        forest.classes.indices.foreach { c =>
          val g = row.getAs[Double](s"p$c")
          assert(java.lang.Double.doubleToRawLongBits(g) ==
            java.lang.Double.doubleToRawLongBits(expProbs(c)),
            s"p$c mismatch: got $g expected ${expProbs(c)} " +
              s"(classes=$nClasses trees=$nTrees x=($x1,$x2,$x3))")
        }
        assert(row.getAs[Double]("pred") == expPred,
          s"pred mismatch (classes=$nClasses trees=$nTrees " +
            s"x=($x1,$x2,$x3) probs=${expProbs.toSeq})")
      }
    }
  }
}
