package graft.functions

import org.apache.spark.sql.{graftBridge, Column}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** DataFrame-API entry points for the engine's custom expressions. */
object api {
  /** Codegen'd cosine similarity of two numeric-array columns (cast to
    * array<double> at the boundary).
    */
  def cosineSim(a: Column, b: Column): Column = {
    val dd = ArrayType(DoubleType)
    graftBridge.column(CosineSimilarity(
      graftBridge.expression(a.cast(dd)), graftBridge.expression(b.cast(dd))))
  }
}
