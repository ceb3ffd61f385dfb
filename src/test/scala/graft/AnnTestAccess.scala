package graft.sim

import org.apache.spark.sql.Column

/** Test-only window into Ann's plan-time quantizer expressions, so specs
  * can assert cell membership without widening the production API. */
object AnnTestAccess {
  def cellOf(cents: Array[Array[Double]], emb: Column): Column =
    Ann.cellOf(cents, emb)
  def cellOfUnrolled(cents: Array[Array[Double]], emb: Column): Column =
    Ann.cellOfUnrolled(cents, emb)
  def probesOf(cents: Array[Array[Double]], emb: Column, nProbe: Int): Column =
    Ann.probesOf(cents, emb, nProbe)
}
