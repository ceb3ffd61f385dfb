package graft.ml

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Loader + native Spark scorer for `graft-sk-forest` JSON — the output of
  * the offline `tools/convert_sklearn.py` converter, which closes the
  * reference's pickled-scikit-learn interop loop
  * (data_model/scikit_learn_model.py:53: `pickle.load` → `model.predict`).
  * A Python pickle cannot execute on the JVM; instead the converter reads
  * the pickle's numpy tree arrays WITHOUT sklearn installed and emits the
  * forest as explicit (left, right, feature, threshold | leaf-probs)
  * node tables, and this object scores them as pure plan literals.
  *
  * Semantics are sklearn's documented predict path, exactly:
  *  - internal node: `x(feature) <= threshold` → left child, else right;
  *  - leaf: the converter pre-normalizes `values[node]` to a probability
  *    vector (the division happens ONCE, offline — the JSON doubles are
  *    the scoring literals, so JVM and oracle agree bit-for-bit);
  *  - forest probability = mean over trees, summed in tree order then one
  *    division by the tree count — the same double DAG mirrored in
  *    [[oracleSql]];
  *  - predict = classes(argmax), numpy-argmax tie-break: a later class
  *    wins only if STRICTLY greater.
  *
  * Scale shape: a converted model is a few KB of literals, so scoring is
  * a zero-shuffle whole-stage-codegen CASE chain over the feature columns
  * — it applies unchanged to a 100 TB scan or an ingest stream, no
  * broadcast, no Python runtime on any executor.
  */
object SkForest {

  /** `l`/`r` are child node indices, −1 at leaves (sklearn TREE_LEAF);
    * `probs` is non-empty only at leaves. */
  final case class Node(l: Int, r: Int, f: Int, t: Double,
                        probs: IndexedSeq[Double])
  final case class Tree(nodes: IndexedSeq[Node])
  final case class Forest(nFeatures: Int, classes: IndexedSeq[Double],
                          trees: IndexedSeq[Tree])

  def fromJson(json: String): Forest = {
    val root = new ObjectMapper().readTree(json)
    require(root.path("framework").asText() == "graft-sk-forest",
      s"load: expected graft-sk-forest, got ${root.path("framework").asText()}")
    def elems(n: JsonNode): Vector[JsonNode] = {
      val it = n.elements(); val b = Vector.newBuilder[JsonNode]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val trees = elems(root.path("trees")).map { t =>
      Tree(elems(t.path("nodes")).map { n =>
        Node(n.path("l").asInt(), n.path("r").asInt(),
          n.path("f").asInt(-1), n.path("t").asDouble(Double.NaN),
          elems(n.path("p")).map(_.asDouble()))
      })
    }
    Forest(root.path("n_features").asInt(),
      elems(root.path("classes")).map(_.asDouble()), trees)
  }

  /** The committed converter fixture (tools/fixtures/sklearn_rf.pkl →
    * this resource); SkForestSpec re-runs the converter and pins
    * byte-parity. */
  def loadFixture(): Forest = {
    val in = getClass.getResourceAsStream("/graft/sklearn_rf.json")
    require(in != null, "missing /graft/sklearn_rf.json resource")
    try fromJson(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  /** Per-tree class-`c` probability: the nested literal CASE chain from
    * the root — recursion follows explicit child pointers, so any sklearn
    * tree shape (not just complete trees) scores. */
  private def treeProb(tree: Tree, c: Int, xs: IndexedSeq[Column]): Column = {
    def rec(i: Int): Column = {
      val n = tree.nodes(i)
      if (n.l < 0) lit(n.probs(c))
      else when(xs(n.f) <= n.t, rec(n.l)).otherwise(rec(n.r))
    }
    rec(0)
  }

  /** Mean-over-trees probability column for class index `c`. */
  def probCol(forest: Forest, c: Int, xs: Seq[Column]): Column =
    forest.trees.map(treeProb(_, c, xs.toIndexedSeq)).reduce(_ + _) /
      lit(forest.trees.size.toDouble)

  /** classes(argmax) over already-materialized per-class prob columns
    * (pass the SAME named columns the output carries, so prediction and
    * reported probabilities cannot diverge). */
  def predictCol(forest: Forest, ps: Seq[Column]): Column = {
    var bestP = ps.head
    var bestC: Column = lit(forest.classes.head)
    for (c <- 1 until ps.size) {
      val better = ps(c) > bestP
      bestC = when(better, lit(forest.classes(c))).otherwise(bestC)
      bestP = when(better, ps(c)).otherwise(bestP)
    }
    bestC
  }

  // ------------------------- DuckDB mirror -------------------------

  private def treeProbSql(tree: Tree, c: Int, xs: IndexedSeq[String]): String = {
    def rec(i: Int): String = {
      val n = tree.nodes(i)
      // leaf literals CAST to DOUBLE: bare decimals would drag DuckDB
      // into DECIMAL arithmetic, a different rounding regime than the
      // Column DAG's IEEE doubles
      if (n.l < 0) s"CAST(${n.probs(c)} AS DOUBLE)"
      else s"(CASE WHEN ${xs(n.f)} <= ${n.t} THEN ${rec(n.l)} " +
        s"ELSE ${rec(n.r)} END)"
    }
    rec(0)
  }

  /** SQL expression for class-`c` probability over feature columns `xs`
    * — same tree order, same one division, so the doubles match the
    * Column DAG bit-for-bit. */
  def probSql(forest: Forest, c: Int, xs: IndexedSeq[String]): String =
    forest.trees.map(treeProbSql(_, c, xs))
      .mkString("(", " + ", s") / ${forest.trees.size.toDouble}")

  /** SQL argmax over per-class prob COLUMN NAMES (from a CTE that
    * materialized [[probSql]] once per class). */
  def predictSql(forest: Forest, ps: IndexedSeq[String]): String = {
    var bestP = ps.head
    var bestC = s"CAST(${forest.classes.head} AS DOUBLE)"
    for (c <- 1 until ps.size) {
      bestC = s"(CASE WHEN ${ps(c)} > $bestP THEN " +
        s"CAST(${forest.classes(c)} AS DOUBLE) ELSE $bestC END)"
      bestP = s"(CASE WHEN ${ps(c)} > $bestP THEN ${ps(c)} ELSE $bestP END)"
    }
    bestC
  }
}
