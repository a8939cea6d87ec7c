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

  test("hstore.handling.mode: json canonicalizes, map types nullable values, malformed is null") {
    import graft.operators.PgValues
    val rows = Seq(
      // escapes in key and value, NULL value, unsorted input keys
      ("""  "b\"k"=>"v\\1" ,  "a"=>NULL, "c"=>"x"  """, 1L),
      // duplicate key: PG keeps the FIRST ('a=>1,a=>2'::hstore rule)
      (""""a"=>"1","a"=>"2"""", 2L),
      ("", 3L),                       // empty hstore -> {}
      (""""unterminated""", 4L),      // malformed -> null
      (""""k"=>"v" trailing""", 5L))  // malformed -> null
      .toDF("h", "id")
    val json = PgValues.hstoreHandling(rows, Seq("h"), "json")
      .orderBy("id").select("h").as[String].collect()
    assert(json(0) === """{"a":null,"b\"k":"v\\1","c":"x"}""", "sorted keys + JSON escaping")
    assert(json(1) === """{"a":"1"}""", "duplicate keys keep the first")
    assert(json(2) === "{}")
    assert(json(3) == null && json(4) == null, "malformed hstore is null, not garbage")
    val m = PgValues.hstoreHandling(rows, Seq("h"), "map").where(col("id") === 1L)
      .select("h").as[Map[String, String]].head()
    assert(m.size === 3 && m("b\"k") === "v\\1" && m("c") === "x" && m("a") == null,
      s"map mode parses the same pairs with a nullable value: $m")
    assert(PgValues.hstoreHandling(rows, Seq("h"), "map").where(col("id") === 1L)
      .select(element_at(col("h"), "c")).as[String].head() === "x")
    intercept[IllegalArgumentException](PgValues.hstoreHandling(rows, Seq("h"), "bogus"))
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
