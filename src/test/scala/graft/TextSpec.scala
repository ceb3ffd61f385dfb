package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Edge cases of the text operators that the oracle gate's corpus never
  * hits: chunk boundaries and packing argument guards.
  */
class TextSpec extends SparkSpec {

  private def chunksOf(text: String, width: Int, overlap: Int): Seq[(Int, String)] = {
    import spark.implicits._
    Seq(text).toDF("text")
      .select(explode(TextFunctions.chunk(
        TextFunctions.tokens(col("text")), width, overlap)).as("c"))
      .select(col("c.start"), col("c.text"))
      .as[(Int, String)].collect().toSeq
  }

  test("chunk: doc shorter than one window is exactly one chunk") {
    assert(chunksOf("a b c", 10, 2) == Seq((0, "a b c")))
  }

  test("chunk: exact multiple has no redundant tail window") {
    // 8 tokens, width 4, overlap 0 -> exactly 2 chunks
    assert(chunksOf("a b c d e f g h", 4, 0) ==
      Seq((0, "a b c d"), (4, "e f g h")))
  }

  test("chunk: overlap repeats the boundary tokens") {
    // 6 tokens, width 4, overlap 2 -> starts 0, 2: windows cover to the end
    assert(chunksOf("a b c d e f", 4, 2) ==
      Seq((0, "a b c d"), (2, "c d e f")))
  }

  test("chunk: last window reaches the end even when short") {
    // 5 tokens, width 4, overlap 1 (step 3): ceil(1/3)+1 = 2 chunks
    assert(chunksOf("a b c d e", 4, 1) ==
      Seq((0, "a b c d"), (3, "d e")))
  }

  test("chunk and pack reject bad arguments") {
    intercept[IllegalArgumentException](
      chunksOf("a", 4, 4)) // overlap must be < width
    intercept[IllegalArgumentException](
      TextFunctions.packBySource(
        spark.range(1).toDF("doc_id"), budget = 0))
  }
}
