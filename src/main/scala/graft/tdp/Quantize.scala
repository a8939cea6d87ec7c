package graft.tdp

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization — symmetric per-vector int8, the standard
  * storage/bandwidth reducer for large embedding corpora (4× smaller than
  * float32; at 100 TB of embeddings the scan, shuffle, and ANN-candidate
  * movement all shrink with it). Pure Catalyst array expressions: narrow,
  * codegen'd, no UDFs, exact ANSI-SQL twin for the oracle.
  *
  * Scheme: `scale = max|x| / 127`; `q_i = round(x_i / scale)` (|q| ≤ 127 by
  * construction, round-half-away-from-zero in both engines); dequantize is
  * `q_i * scale`, with per-element absolute error ≤ scale/2.
  */
object Quantize {

  /** Per-vector symmetric scale (guarded against the zero vector). */
  def int8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))) / 127.0, lit(1e-30))

  /** Quantized int8 codes. */
  def int8(vec: Column): Column = {
    val s = int8Scale(vec)
    transform(vec, x => round(x.cast("double") / s).cast("int"))
  }

  /** Dequantized doubles (q * scale). */
  def dequantInt8(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Max per-element absolute reconstruction error of the roundtrip —
    * bounded by scale/2; the spec and oracle check the bound holds.
    */
  def int8MaxAbsError(vec: Column): Column = {
    val s = int8Scale(vec)
    array_max(transform(vec, x =>
      abs(x.cast("double") - round(x.cast("double") / s) * s)))
  }
}
