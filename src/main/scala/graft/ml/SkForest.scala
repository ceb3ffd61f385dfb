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
    * this resource) as raw JSON; null-checked so a missing resource fails
    * with its own message, not an NPE inside a finally. */
  def fixtureJson(): String = {
    val in = getClass.getResourceAsStream("/graft/sklearn_rf.json")
    require(in != null, "missing /graft/sklearn_rf.json resource")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The committed converter fixture, parsed; SkForestSpec re-runs the
    * converter and pins byte-parity. */
  def loadFixture(): Forest = fromJson(fixtureJson())

  /** The committed MLLIB-fitted pinned forest ([[MllibExport]] over the
    * sf0.001 quality features — regenerate with
    * `tools/run_local.sh graft.ml.MllibExport`) as raw JSON. */
  def mllibFixtureJson(): String = {
    val in = getClass.getResourceAsStream("/graft/mllib_rf.json")
    require(in != null, "missing /graft/mllib_rf.json resource")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The committed MLlib pinned forest, parsed; MllibExportSpec re-fits
    * and pins byte-parity plus transform-prediction parity. */
  def loadMllibFixture(): Forest = fromJson(mllibFixtureJson())

  /** The mlm:framework value a STAC-MLM item uses to declare a converted
    * sklearn forest asset (see [[StacMlm.loadSkForest]]). */
  val Framework = "graft-sk-forest"

  /** Score a feature table with a converted sklearn forest — the
    * reference's pickled-model predict over any feature table
    * (scikit_learn_model.py:53), shared VERBATIM by the
    * `ml_sklearn_predict` query and the `process_graph_sklearn` graph
    * twin so both land on one oracle. `bands` is the model's declared
    * mlm:input band list: when the input table already carries those
    * columns they are scored DIRECTLY (the reference accepts any feature
    * table — the declared bands bind, they are not decorative); only when
    * they are absent and the item declares the quality-feature bands
    * x1,x2,x3 are they derived from a raw documents table via
    * [[RidgeProbe.qualityFeatures]] (the fixture pipeline's convenience
    * path). */
  def scoreDocuments(docs: org.apache.spark.sql.DataFrame, forest: Forest,
                     bands: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(forest.nFeatures == bands.size,
      s"model expects ${forest.nFeatures} features, item declares " +
        s"${bands.size} bands")
    val xs = bands.map(col)
    val feats =
      if (bands.forall(docs.columns.contains)) docs
      else {
        require(bands == Seq("x1", "x2", "x3"),
          s"graft-sk-forest scoring: input table lacks the declared band " +
            s"columns $bands and no derivation is known (only the " +
            s"quality-feature bands x1,x2,x3 derive from a raw documents " +
            s"table)")
        RidgeProbe.qualityFeatures(docs)
      }
    val scored = forest.classes.indices.foldLeft(feats) { (df, c) =>
      df.withColumn(s"p$c", probCol(forest, c, xs))
    }
    val ps = forest.classes.indices.map(c => col(s"p$c"))
    // id/label passthroughs kept when present (the documents pipeline
    // carries both; a bare feature table may carry neither)
    val idKeep = Seq("doc_id").filter(feats.columns.contains).map(col)
    val yKeep = Seq("y").filter(feats.columns.contains).map(col)
    scored.withColumn("pred", predictCol(forest, ps))
      .select(idKeep ++ xs ++ yKeep ++ ps :+ col("pred"): _*)
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
    * reported probabilities cannot diverge).
    *
    * Shape: `greatest(p0..pC)` + a first-match equality CASE — the first
    * class whose prob equals the maximum wins, which IS numpy argmax's
    * first-maximal-index rule. Expression size is O(C²) attribute
    * references (the greatest() inlined per WHEN), never the O(2^C)
    * blowup a running-best fold produces — a 20-class forest stays a
    * few-hundred-node plan. */
  def predictCol(forest: Forest, ps: Seq[Column]): Column = {
    require(ps.size == forest.classes.size,
      s"predict: ${ps.size} prob columns for ${forest.classes.size} classes")
    if (ps.size == 1) lit(forest.classes.head)
    else {
      val best = greatest(ps: _*)
      ps.init.zip(forest.classes.init)
        .foldRight(lit(forest.classes.last): Column) {
          case ((p, c), acc) => when(p === best, lit(c)).otherwise(acc)
        }
    }
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
    * materialized [[probSql]] once per class) — the same linear
    * greatest + first-match CASE as [[predictCol]], so both engines pick
    * the first maximal index. */
  def predictSql(forest: Forest, ps: IndexedSeq[String]): String = {
    require(ps.size == forest.classes.size,
      s"predict: ${ps.size} prob columns for ${forest.classes.size} classes")
    if (ps.size == 1) s"CAST(${forest.classes.head} AS DOUBLE)"
    else {
      val best = ps.mkString("greatest(", ", ", ")")
      val whens = ps.init.zip(forest.classes.init).map { case (p, c) =>
        s"WHEN $p = $best THEN CAST($c AS DOUBLE)"
      }.mkString(" ")
      s"(CASE $whens ELSE CAST(${forest.classes.last} AS DOUBLE) END)"
    }
  }
}
