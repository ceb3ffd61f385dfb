package graft.core

/** Determinant / Cramer-solve expression generator, abstract over the
  * arithmetic so the SAME expansion can be instantiated once as Spark
  * `Column` math and once as oracle SQL text. Both engines then evaluate
  * an identical IEEE-double DAG, so results are bit-identical — the same
  * cross-engine trick the polygon ray-cast uses (CubeQueries.insideSql).
  *
  * Laplace expansion along the first column: exponential in n, fine for
  * the n ≤ 4 normal-equation systems of low-degree curve fitting.
  */
object Cramer {

  final case class Arith[T](add: (T, T) => T, sub: (T, T) => T,
                            mul: (T, T) => T, div: (T, T) => T)

  def det[T](m: Vector[Vector[T]], a: Arith[T]): T =
    if (m.length == 1) m(0)(0)
    else {
      val terms = m.indices.map { i =>
        val minor = m.zipWithIndex.collect {
          case (row, r) if r != i => row.tail
        }
        a.mul(m(i)(0), det(minor, a))
      }
      terms.zipWithIndex.tail.foldLeft(terms.head) {
        case (acc, (t, i)) => if (i % 2 == 0) a.add(acc, t) else a.sub(acc, t)
      }
    }

  /** Solve M·c = r by Cramer's rule where `mat(i)(j)` and `rhs(i)` are
    * expression atoms; returns the n coefficient expressions. */
  def solve[T](mat: Vector[Vector[T]], rhs: Vector[T], a: Arith[T]): Seq[T] = {
    val dd = det(mat, a)
    mat.indices.map { k =>
      val repl = mat.zipWithIndex.map { case (row, i) =>
        row.updated(k, rhs(i))
      }
      a.div(det(repl, a), dd)
    }
  }

  val columns: Arith[org.apache.spark.sql.Column] =
    Arith(_ + _, _ - _, _ * _, _ / _)

  /** SQL text arithmetic, fully parenthesized so associativity is pinned
    * to exactly the structure the Column side evaluates. */
  val sql: Arith[String] = Arith(
    (x, y) => s"($x + $y)", (x, y) => s"($x - $y)",
    (x, y) => s"($x * $y)", (x, y) => s"($x / $y)")
}
