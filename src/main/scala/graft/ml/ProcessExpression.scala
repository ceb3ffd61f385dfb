package graft.ml

import org.apache.spark.sql.functions._

import graft.cube.DataCube

/** Custom pre-/post-processing expressions for value scaling — the analog
  * of the reference's ProcessingExpression support
  * (utils/proc_expression_utils.py:59 `run_process_expression`, with the
  * module whitelist of proc_expression_utils.py:21).
  *
  * The reference evaluates a python expression string against the cube with
  * a whitelist of importable modules; here the format is `sql`: the
  * expression references the cell value as `x` and is parsed by Catalyst,
  * then every node of the parsed tree is checked against a whitelist of
  * pure arithmetic/math expression classes — no UDF calls, no reflection,
  * no subqueries can hide in a scaling spec. Unsupported formats raise,
  * mirroring `_raise_format_not_implemented`.
  */
object ProcessExpression {

  /** Catalyst expression classes a scaling expression may contain
    * (operators parse to concrete classes; named functions parse to
    * UnresolvedFunction and are checked by name below). */
  private val allowedClasses: Set[String] = Set(
    "Literal", "UnresolvedAttribute", "UnresolvedFunction",
    "UnaryMinus", "UnaryPositive", "Add", "Subtract", "Multiply", "Divide",
    "Remainder", "Least", "Greatest")

  private val allowedFunctions: Set[String] = Set(
    "sqrt", "cbrt", "abs", "exp", "expm1", "ln", "log", "log1p", "log2",
    "log10", "pow", "power", "least", "greatest", "round", "floor", "ceil",
    "ceiling", "sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh",
    "tanh", "sign", "signum")

  /** Additional node classes a PREDICATE expression may contain —
    * comparisons and boolean combinators (filter_labels conditions). */
  private val predicateClasses: Set[String] = Set(
    "GreaterThan", "GreaterThanOrEqual", "LessThan", "LessThanOrEqual",
    "EqualTo", "EqualNullSafe", "Not", "And", "Or")

  def validate(spark: org.apache.spark.sql.SparkSession,
               expression: String,
               allowedRefs: Set[String] = Set("x"),
               extraClasses: Set[String] = Set.empty): Unit = {
    val parsed = spark.sessionState.sqlParser.parseExpression(expression)
    val refs = parsed.collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.name
    }
    require(refs.toSet.subsetOf(allowedRefs),
      s"expression may only reference ${allowedRefs.mkString("/")}, " +
        s"got: ${refs.distinct}")
    val allowed = allowedClasses ++ extraClasses
    val badClasses = parsed.collect {
      case e if !allowed.contains(e.getClass.getSimpleName) =>
        e.getClass.getSimpleName
    }
    require(badClasses.isEmpty,
      s"scaling expression uses non-whitelisted operations: ${badClasses.distinct}")
    val badFns = parsed.collect {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if !allowedFunctions.contains(f.nameParts.mkString(".").toLowerCase) =>
        f.nameParts.mkString(".")
    }
    require(badFns.isEmpty,
      s"scaling expression uses non-whitelisted functions: ${badFns.distinct}")
  }

  /** Validate an expression and bind its references to actual columns —
    * the general whitelisted-callback form used by process-graph `apply` /
    * overlap resolvers as well as scaling.
    *
    * The substitution happens on the PARSED tree (each bound
    * UnresolvedAttribute → its column's expression), so exactly the
    * expression that was validated is executed — a textual rewrite would
    * also hit reference names inside string literals and could drift from
    * the validated tree. */
  def column(spark: org.apache.spark.sql.SparkSession, expression: String,
             bindings: Map[String, org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    validate(spark, expression, bindings.keySet)
    bind(spark, expression, bindings).cast("double")
  }

  /** Predicate form — the condition callback of openEO `filter_labels`:
    * the arithmetic whitelist plus comparisons and boolean combinators,
    * bound and returned as a boolean column. */
  def predicate(spark: org.apache.spark.sql.SparkSession, expression: String,
                bindings: Map[String, org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    validate(spark, expression, bindings.keySet, predicateClasses)
    bind(spark, expression, bindings).cast("boolean")
  }

  private def bind(spark: org.apache.spark.sql.SparkSession,
                   expression: String,
                   bindings: Map[String, org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column = {
    val parsed = spark.sessionState.sqlParser.parseExpression(expression)
    val substituted = parsed.transform {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if bindings.contains(a.name) =>
        org.apache.spark.sql.GraftBridge.toExpression(bindings(a.name))
    }
    org.apache.spark.sql.GraftBridge.toColumn(substituted)
  }

  /** Apply a processing expression to a cube's value column. Only format
    * `sql` is implemented; others raise like the reference. */
  def scaleCube(cube: DataCube, format: String, expression: String): DataCube = {
    if (format != "sql")
      throw new UnsupportedOperationException(
        s"processing expression format '$format' not implemented")
    val spark = cube.df.sparkSession
    cube.copy(df = cube.df.withColumn(cube.valueCol,
      column(spark, expression, Map("x" -> col(cube.valueCol)))))
  }
}
