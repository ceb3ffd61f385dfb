package graft.dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.core.Tables.documents(spark, d)
    import graft.functions.TextFunctions
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    docs.count() // warm
    val tk = TextFunctions.tokens(col("text"))
    val shared = graft.core.CacheScope.pin(
      docs.select(col("doc_id"), tk.as("_toks"),
        array_distinct(TextFunctions.shingles(tk, 4)).as("_shs")))
    t("shared populate") { shared.count() }
    val sigs = t("sig plan") { Dedup.simhashBlockSigsFrom(shared) }
    t("sig count") { sigs.count() }
    val blocks0 = t("blockRows plan") {
      sigs.select(col("doc_id").as("id"), col("b0"), col("b1"),
        col("b2"), col("b3"), explode(sequence(lit(0), lit(3))).as("blk"))
      .withColumn("key",
        when(col("blk") === 0, col("b0"))
          .when(col("blk") === 1, col("b1"))
          .when(col("blk") === 2, col("b2"))
          .otherwise(col("b3"))) }
    val blocks = graft.core.CacheScope.pin(blocks0)
    t("blocks populate (count)") { blocks.count() }
    val blocksB = graft.core.CacheScope.pin(blocks0.withColumn("dummy", lit(1)))
    t("blocks populate AGAIN (new plan)") { blocksB.count() }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val blocksC = graft.core.CacheScope.pin(blocks0.withColumn("dummy2", lit(2)))
    t("blocks populate NO-CODEGEN") { blocksC.count() }
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val sizes = blocks.groupBy("blk", "key")
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1 && col("_n") <= 1024)
      .select(col("blk"), col("key"))
    val bounded = blocks.join(sizes.hint("shuffle_hash"), Seq("blk", "key"))
    val a1 = bounded.select(col("blk"), col("key"), col("id").as("doc_a"),
      col("b0").as("a0"), col("b1").as("a1"), col("b2").as("a2"),
      col("b3").as("a3"))
    val b1 = bounded.select(col("blk").as("_blkb"), col("key").as("_keyb"),
      col("id").as("doc_b"), col("b0").as("v0"), col("b1").as("v1"),
      col("b2").as("v2"), col("b3").as("v3"))
    val ham = (0 until 4).map(i =>
      bit_count(col(s"a$i").bitwiseXOR(col(s"v$i")))).reduce(_ + _)
    val pairs = a1.join(b1, col("blk") === col("_blkb") &&
        col("key") === col("_keyb") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), ham.cast("int").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
    t("pair join count") { pairs.count() }
    graft.core.CacheScope.releaseAll()
    spark.stop()
  }
}
