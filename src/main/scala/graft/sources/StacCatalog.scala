package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STAC-style catalog source — the analog of the reference's
  * `load_collection`/`load_stac` planning step (minibackend/
  * custom_processes.py:60: select items from a STAC catalog by extent,
  * then load only their assets).
  *
  * The catalog is an ItemCollection JSON: metadata, kilobytes. Item
  * selection happens on the DRIVER against item properties — this is
  * file-level partition pruning: at 100 TB a temporal extent turns into
  * "read 3 of 5000 asset files" before any Spark job starts, and the
  * residual row-level extent filter still pushes into each parquet scan.
  */
object StacCatalog {

  private val mapper = new ObjectMapper()

  /** One property predicate against item metadata: `op` ∈
    * lt | lte | gt | gte | eq (numeric), like the reference's
    * load_collection `properties` argument (custom_processes.py:60). */
  final case class PropertyFilter(name: String, op: String, value: Double) {
    def accepts(x: Double): Boolean = op match {
      case "lt" => x < value
      case "lte" => x <= value
      case "gt" => x > value
      case "gte" => x >= value
      case "eq" => x == value
      case other => throw new IllegalArgumentException(s"property op: $other")
    }
  }

  /** Items overlapping the extent (ISO-8601 strings compare
    * lexicographically, so no datetime parsing is needed) and passing all
    * property filters. Items missing a filtered property are excluded,
    * the STAC convention. */
  def selectAssets(catalogPath: String,
                   temporalExtent: Option[(String, String)],
                   properties: Seq[PropertyFilter] = Nil): Seq[String] = {
    val root = mapper.readTree(new java.io.File(catalogPath))
    val feats = root.path("features").elements().asScala.toSeq
    val selected = feats.filter { f =>
      val p = f.path("properties")
      val inExtent = temporalExtent.forall { case (from, to) =>
        val s = p.path("start_datetime").asText(p.path("datetime").asText(""))
        val e = p.path("end_datetime").asText(p.path("datetime").asText(""))
        s < to && e >= from
      }
      inExtent && properties.forall { pf =>
        p.has(pf.name) && pf.accepts(p.path(pf.name).asDouble())
      }
    }
    selected.map(_.path("assets").path("data").path("href").asText())
      .filter(_.nonEmpty)
  }

  /** Load the collection: pruned asset files → one scan → residual
    * row-level extent filter (reaches PushedFilters). */
  def loadCollection(spark: SparkSession, catalogPath: String,
                     temporalExtent: Option[(String, String)] = None,
                     timeCol: String = "ts",
                     properties: Seq[PropertyFilter] = Nil): DataFrame = {
    val hrefs = selectAssets(catalogPath, temporalExtent, properties)
    require(hrefs.nonEmpty, "no catalog items overlap the requested extent")
    val df = spark.read.parquet(hrefs: _*)
    temporalExtent.fold(df) { case (from, to) =>
      df.filter(col(timeCol) >= lit(from).cast("timestamp") &&
        col(timeCol) < lit(to).cast("timestamp"))
    }
  }
}
