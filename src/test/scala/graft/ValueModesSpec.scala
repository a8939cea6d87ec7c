package graft

import org.apache.spark.sql.functions._
import graft.operators.Transforms

/** Value-handling modes: decimal.handling.mode, binary.handling.mode,
  * time.precision.mode (reference semantics, studied not copied:
  * `RelationalDatabaseConnectorConfig.DecimalHandlingMode`,
  * `CommonConnectorConfig.BinaryHandlingMode`, `TemporalPrecisionMode`).
  */
class ValueModesSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq((1L, "2.25", "hi?>", "2024-05-06 07:08:09.123456"))
    .toDF("id", "d", "b", "t")
    .select(col("id"), col("d").cast("decimal(14,2)").as("d"),
      col("b").cast("binary").as("b"), col("t").cast("timestamp").as("t"))

  test("decimal.handling.mode: precise keeps decimal; double and string render") {
    assert(Transforms.decimalHandling(base, Seq("d"), "precise").schema("d").dataType.typeName
      .startsWith("decimal"))
    val dbl = Transforms.decimalHandling(base, Seq("d"), "double").select("d").as[Double].head()
    assert(dbl === 2.25)
    val str = Transforms.decimalHandling(base, Seq("d"), "string").select("d").as[String].head()
    assert(str === "2.25")
    // scale is preserved in the string rendering (2 → "2.00")
    val two = base.withColumn("d", lit(2).cast("decimal(14,2)"))
    assert(Transforms.decimalHandling(two, Seq("d"), "string").select("d").as[String].head() === "2.00")
    intercept[IllegalArgumentException](Transforms.decimalHandling(base, Seq("d"), "bogus"))
  }

  test("binary.handling.mode: bytes/base64/base64-url-safe/hex") {
    def mode(m: String): String =
      Transforms.binaryHandling(base, Seq("b"), m).select("b").as[String].head()
    // "hi?>" = 68 69 3f 3e; base64 = aGk/Pg==, url-safe swaps / for _
    assert(mode("base64") === "aGk/Pg==")
    assert(mode("base64-url-safe") === "aGk_Pg==")
    assert(mode("hex") === "68693f3e")
    val bytes = Transforms.binaryHandling(base, Seq("b"), "bytes")
      .select("b").as[Array[Byte]].head()
    assert(new String(bytes, "UTF-8") === "hi?>")
  }

  test("time.precision.mode: adaptive keeps micros, connect truncates to millis") {
    val us = Transforms.temporalPrecision(base, Seq("t"), "adaptive").select("t").as[Long].head()
    val ms = Transforms.temporalPrecision(base, Seq("t"), "connect").select("t").as[Long].head()
    assert(us % 1000000L === 123456L)
    assert(ms === us / 1000L)
    assert(Transforms.temporalPrecision(base, Seq("t"), "adaptive_time_microseconds")
      .select("t").as[Long].head() === us)
  }
}
