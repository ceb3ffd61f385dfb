package graft

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical enforcement of SCALE.md's contract: every driver-side
  * `.collect()` and every unpartitioned window (`Window.orderBy` with no
  * partitionBy) in main sources must appear in SCALE.md's inventory tables
  * at its CURRENT file:line, and every inventoried line must still carry
  * the construct. A new undocumented site is a scale regression (it has no
  * reviewed budget); a stale line is inventory rot — either way the build
  * fails instead of relying on a review convention.
  */
class ScaleInventorySpec extends AnyFunSuite {

  private val repo = new java.io.File(".").getCanonicalFile
  private val mainSrc = new java.io.File(repo, "src/main/scala").toPath

  private lazy val scaleMd: String = {
    val f = new java.io.File(repo, "SCALE.md")
    assert(f.isFile, "SCALE.md must sit next to the build")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
  }

  /** Every `some/File.scala:12[,:34…]` reference in SCALE.md. */
  private lazy val documented: Set[(String, Int)] = {
    val ref = """([A-Za-z0-9_/]+\.scala):(\d+(?:,:\d+)*)""".r
    ref.findAllMatchIn(scaleMd).flatMap { m =>
      m.group(2).split(",:").map(l => (m.group(1), l.toInt))
    }.toSet
  }

  private val Patterns = Seq(".collect()", "Window.orderBy")

  /** (relative path, 1-based line) of every non-comment occurrence. */
  private def sites(pattern: String): Seq[(String, Int)] = {
    val stream = java.nio.file.Files.walk(mainSrc)
    try {
      stream.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val rel = mainSrc.relativize(p).toString
          java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.collect {
            case (ln, i)
                if ln.contains(pattern) && !ln.trim.startsWith("//") =>
              (rel, i + 1)
          }
        }
        .toSeq
    } finally stream.close()
  }

  /** SCALE.md refs omit the `graft/` package root; resolve to the exact
    * relative path. EXACT equality, not endsWith — a suffix match would
    * let a same-suffix file (`foo/sub/dedup/Dedup.scala`) silently
    * satisfy a `dedup/Dedup.scala` inventory row. */
  private def sameFile(rel: String, documentedFile: String): Boolean =
    rel == documentedFile || rel == s"graft/$documentedFile"

  private def assertInventoried(found: Seq[(String, Int)],
                                what: String): Unit = {
    val missing = found.filterNot { case (f, l) =>
      documented.exists { case (df, dl) => sameFile(f, df) && dl == l }
    }
    assert(missing.isEmpty,
      s"$what sites NOT in SCALE.md's inventory (a new site is a scale " +
        "regression until it has a reviewed budget row; a moved site is " +
        "stale inventory): " +
        missing.map { case (f, l) => s"$f:$l" }.mkString(", "))
  }

  test("every driver-side collect() in main sources is inventoried") {
    val found = sites(".collect()")
    assert(found.nonEmpty, "expected at least one collect site")
    assertInventoried(found, "collect()")
  }

  test("every unpartitioned window in main sources is inventoried") {
    val found = sites("Window.orderBy")
    assert(found.nonEmpty, "expected at least one unpartitioned window")
    assertInventoried(found, "unpartitioned-window")
  }

  test("SCALE.md inventory lines are current: each still carries its " +
       "construct") {
    documented.foreach { case (f, l) =>
      val file = java.nio.file.Files.walk(mainSrc).iterator().asScala
        .find(p => sameFile(mainSrc.relativize(p).toString, f))
      assert(file.isDefined, s"SCALE.md references $f which no longer exists")
      val lines = java.nio.file.Files.readAllLines(file.get)
      assert(l >= 1 && l <= lines.size(),
        s"SCALE.md references $f:$l beyond end of file")
      val ln = lines.get(l - 1)
      assert(Patterns.exists(ln.contains),
        s"SCALE.md references $f:$l but that line carries no inventoried " +
          s"construct anymore (rot): '${ln.trim}'")
    }
  }
}
