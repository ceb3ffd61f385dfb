package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper

import graft.ml.TreeProbe.{Split, Tree}
import graft.ml.BoostProbe.RTree

/** Save/load for the hash-verified trainer family — the A4/A5
  * (`save_ml_model` / `load_ml_model`) surface extended to the models
  * this repo can gate end-to-end. Format: one `probe.json` per model
  * (framework tag + structure), the `graft-mlp`/mlm.json sidecar
  * convention. Doubles serialize via Scala `toString`, which round-trips
  * bit-exactly (the established literal convention), so a loaded model
  * scores IDENTICALLY to the fitted one — `ml_tree_roundtrip` proves it
  * through the gate by sharing ml_tree_fit's hash oracle.
  *
  * Paths go through the Hadoop FileSystem API (graft.sources.Remote
  * convention), so models persist to whatever the lake uses.
  */
object ProbeModels {

  private def q(s: String) = "\"" + s + "\""

  private def splitsJson(splits: Seq[Split]): String =
    splits.map(s => s"""{"node":${s.node},"f":${s.f},"t":${s.t}}""")
      .mkString("[", ",", "]")

  def treeJson(t: Tree): String =
    s"""{"framework":"graft-tree","splits":${splitsJson(t.splits)},
       |"leaf_pred":${t.leafPred.toSeq.sortBy(_._1)
         .map { case (n, p) => s"""{"n":$n,"p":$p}""" }
         .mkString("[", ",", "]")}}""".stripMargin

  def forestJson(trees: Seq[Tree]): String =
    trees.map(treeJson).mkString(
      """{"framework":"graft-forest","trees":[""", ",", "]}")

  def boostJson(f0: Double, nu: Double, trees: Seq[RTree]): String = {
    val ts = trees.map(t =>
      s"""{"splits":${splitsJson(t.splits)},
         |"leaf_val":${t.leafVal.toSeq.sortBy(_._1)
           .map { case (n, v) => s"""{"n":$n,"v":${q(v.toString)}}""" }
           .mkString("[", ",", "]")}}""".stripMargin)
      .mkString("[", ",", "]")
    s"""{"framework":"graft-boost","f0":${q(f0.toString)},"nu":${q(nu.toString)},"trees":$ts}"""
  }

  private def parse(json: String) = new ObjectMapper().readTree(json)

  private def parseSplits(n: com.fasterxml.jackson.databind.JsonNode): Seq[Split] = {
    val it = n.elements()
    val b = Vector.newBuilder[Split]
    while (it.hasNext) {
      val e = it.next()
      b += Split(e.path("node").asInt(), e.path("f").asInt(), e.path("t").asInt())
    }
    b.result()
  }

  def treeFromJson(json: String): Tree = {
    val root = parse(json)
    require(root.path("framework").asText() == "graft-tree",
      s"load: expected graft-tree, got ${root.path("framework").asText()}")
    val lp = {
      val it = root.path("leaf_pred").elements()
      val b = Map.newBuilder[Int, Int]
      while (it.hasNext) {
        val e = it.next(); b += e.path("n").asInt() -> e.path("p").asInt()
      }
      b.result()
    }
    Tree(parseSplits(root.path("splits")), lp)
  }

  def forestFromJson(json: String): Seq[Tree] = {
    val root = parse(json)
    require(root.path("framework").asText() == "graft-forest",
      s"load: expected graft-forest, got ${root.path("framework").asText()}")
    val it = root.path("trees").elements()
    val b = Vector.newBuilder[Tree]
    while (it.hasNext) {
      val t = it.next()
      val lp = {
        val li = t.path("leaf_pred").elements()
        val m = Map.newBuilder[Int, Int]
        while (li.hasNext) {
          val e = li.next(); m += e.path("n").asInt() -> e.path("p").asInt()
        }
        m.result()
      }
      b += Tree(parseSplits(t.path("splits")), lp)
    }
    b.result()
  }

  def boostFromJson(json: String): (Double, Double, Seq[RTree]) = {
    val root = parse(json)
    require(root.path("framework").asText() == "graft-boost",
      s"load: expected graft-boost, got ${root.path("framework").asText()}")
    val it = root.path("trees").elements()
    val b = Vector.newBuilder[RTree]
    while (it.hasNext) {
      val t = it.next()
      val lv = {
        val li = t.path("leaf_val").elements()
        val m = Map.newBuilder[Int, Double]
        while (li.hasNext) {
          val e = li.next()
          m += e.path("n").asInt() -> e.path("v").asText().toDouble
        }
        m.result()
      }
      b += RTree(parseSplits(t.path("splits")), lv)
    }
    (root.path("f0").asText().toDouble, root.path("nu").asText().toDouble,
      b.result())
  }

  /** Write/read one sidecar file through the Hadoop FS (lake-portable). */
  def write(spark: org.apache.spark.sql.SparkSession, path: String,
            json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def read(spark: org.apache.spark.sql.SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8")
    finally in.close()
  }
}
