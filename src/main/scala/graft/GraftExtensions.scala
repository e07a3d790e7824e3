package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{InflateRaw, ParsePyLine}

/** Session-extension installer: makes the engine's custom expressions
  * (`inflate_raw`, `parse_pyline`) available in every session created with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the idiomatic
  * cluster-wide registration path. Local callers that build their own
  * session get the same functions lazily via the Column wrappers
  * (InflateRaw.inflate_raw / ParsePyLine.parse_pyline).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("inflate_raw"),
      new ExpressionInfo(classOf[InflateRaw].getName, "inflate_raw"),
      (exprs: Seq[Expression]) => InflateRaw(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("parse_pyline"),
      new ExpressionInfo(classOf[ParsePyLine].getName, "parse_pyline"),
      (exprs: Seq[Expression]) => ParsePyLine(exprs.head)))
  }
}
