package graft.cube

/** Dimension-name alias resolution.
  *
  * Mirrors the alias tables of the reference
  * (`utils/dim_utils.py:11-16`): a cube may call its band dimension
  * `band`/`bands`/`b`/`channel`/…, its time dimension `time`/`t`/`date`/…,
  * and operators must resolve them case-insensitively.
  */
object DimAliases {
  val band: Seq[String]  = Seq("band", "bands", "b", "channel", "channels")
  val time: Seq[String]  = Seq("time", "times", "t", "date", "dates")
  val x: Seq[String]     = Seq("x", "lon", "lng", "longitude")
  val y: Seq[String]     = Seq("y", "lat", "latitude")
  val batch: Seq[String] = Seq("batch", "batches")
  val spatial: Seq[String] = x ++ y

  /** Find the dimension in `dims` matching one of `options` (lower-cased),
    * or an exact (case-sensitive) hit on `wanted` itself first.
    */
  def resolve(dims: Seq[String], options: Seq[String]): Option[String] =
    dims.find(d => options.contains(d.toLowerCase))

  /** Map a requested dimension name to the cube's actual dimension name,
    * looking through the alias group the requested name belongs to
    * (reference: dim_utils.get_alternative_datacube_dim_name).
    */
  def alternative(dims: Seq[String], wanted: String): Option[String] = {
    if (dims.contains(wanted)) return Some(wanted)
    val w = wanted.toLowerCase
    Seq(band, time, x, y, batch)
      .find(_.contains(w))
      .flatMap(group => resolve(dims, group))
  }
}

/** Band-name alias groups (reference: dim_utils.get_band_alternative_names,
  * dim_utils.py:160-199): Sentinel-2 style `b04` ↔ `red` ↔ `B04_10m` etc.
  */
object BandAliases {
  private val groups: Seq[Seq[String]] = Seq(
    Seq("b01", "coastal", "b01_20m", "b01_60m"),
    Seq("b02", "b2", "blue", "b02_10m", "b02_20m", "b02_60m"),
    Seq("b03", "b3", "green", "b03_10m", "b03_20m", "b03_60m"),
    Seq("b04", "b4", "red", "b04_10m", "b04_20m", "b04_60m"),
    Seq("b05", "b5", "rededge1", "b05_20m", "b05_60m"),
    Seq("b06", "b6", "rededge2", "b06_20m", "b06_60m"),
    Seq("b07", "b7", "rededge3", "b07_20m", "b07_60m"),
    Seq("b08", "b8", "nir", "b08_10m", "b08_20m", "b08_60m"),
    Seq("b8a", "b08a", "nir08", "nir08a", "nir_narrow", "b8a_20m", "b8a_60m"),
    Seq("b09", "b9", "nir09", "b09_60m"),
    Seq("b10", "cirrus"),
    Seq("b11", "swir16", "swir1", "swir_1", "swir-1", "b11_20m", "b11_60m"),
    Seq("b12", "swir22", "swir2", "swir_2", "swir-2", "b12_20m", "b12_60m"),
    Seq("aot"), Seq("scl"), Seq("snw"),
    Seq("hh"), Seq("hv"), Seq("vh"), Seq("vv"),
    Seq("ndvi")
  )

  def alternatives(bandName: String): Seq[String] = {
    val lower = bandName.toLowerCase
    groups.find(_.contains(lower)).getOrElse(Seq(bandName))
  }

  /** Resolve requested band names against the band labels present in a cube,
    * honoring alias groups (reference: dim_utils.get_dc_band_names).
    */
  def resolveAll(cubeBands: Seq[String], wanted: Seq[String]): Seq[String] = {
    val lowerCube = cubeBands.map(_.toLowerCase)
    wanted.flatMap { w =>
      if (cubeBands.contains(w)) Some(w)
      else alternatives(w).collectFirst {
        case alt if lowerCube.contains(alt) => cubeBands(lowerCube.indexOf(alt))
      }
    }
  }
}
