package graft.cube

/** Minimal CRS analog of the reference's projection handling: the
  * reference reads each cube's CRS before spatial operations
  * (utils/epsg_utils.py:10) and its cubes carry a projection + the
  * raster's affine grid transform. The part that matters on the synthetic
  * integer grid is the transform: it maps cell indices to world
  * coordinates, and RE-GRIDDING between two transforms of the same CRS is
  * pure column math (codegen, no shuffle beyond the final reduce). True
  * datum shifts (cross-EPSG PROJ math) need a projection library this
  * container doesn't have, so cross-EPSG operations are REJECTED with a
  * descriptive error — mirroring the reference's dimension-mismatch
  * checks — never silently mixed.
  *
  * Axis-aligned affine in GDAL geotransform order (no rotation terms):
  * worldX = a·x + c, worldY = e·y + f, where (x, y) is the CENTER offset
  * of a cell index (index + 0.5).
  */
final case class Crs(epsg: Int,
                     a: Double = 1.0, c: Double = 0.0,
                     e: Double = 1.0, f: Double = 0.0) {
  require(a != 0.0 && e != 0.0, s"Crs: zero pixel size (a=$a, e=$e)")

  override def toString: String = s"EPSG:$epsg[a=$a,c=$c,e=$e,f=$f]"
}
