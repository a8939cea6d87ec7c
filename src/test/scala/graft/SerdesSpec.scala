package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Serdes

/** Consumer-side JSON serde (`JsonSerde.readValue`/`readKey` semantics). */
class SerdesSpec extends SparkSpec {
  import spark.implicits._

  private val rowDdl = "id bigint, name string"

  private def decode(json: String, fromField: Option[String] = None,
      ignoreUnknown: Boolean = true): Row =
    Seq(json).toDF("j")
      .select(Serdes.payloadJsonValue(col("j"), rowDdl, fromField, ignoreUnknown).as("v"))
      .select("v.*").head()

  test("schema+payload wrapper is unwrapped; bare documents parse as-is") {
    val bare = """{"id": 7, "name": "a"}"""
    val wrapped = s"""{"schema": {"type": "struct"}, "payload": $bare}"""
    assert(decode(bare) === Row(7L, "a"))
    assert(decode(wrapped) === Row(7L, "a"))
  }

  test("from.field extracts only when the node has source AND the field") {
    val env =
      """{"before": null, "after": {"id": 1, "name": "x"},
        |"source": {"lsn": 5}, "op": "c"}""".stripMargin
    assert(decode(env, fromField = Some("after")) === Row(1L, "x"))
    // extracted format: no `source` → the node itself is the record
    assert(decode("""{"id": 2, "name": "y"}""", fromField = Some("after")) === Row(2L, "y"))
    // envelope with from.field=before on a create: before is present
    // (json-null) → extracted → null record
    assert(decode(env, fromField = Some("before")) === Row(null, null))
    // only before/after are legal from.field values
    intercept[IllegalArgumentException](decode(env, fromField = Some("source")))
  }

  test("as-envelope consumption (no from.field) parses the whole payload") {
    val env = """{"payload": {"id": 3, "name": "z", "op": "c"}}"""
    assert(decode(env) === Row(3L, "z"))
  }

  test("unknown.properties.ignored=false raises; =true drops silently") {
    val extra = """{"id": 4, "name": "w", "surprise": true}"""
    assert(decode(extra, ignoreUnknown = true) === Row(4L, "w"))
    val e = intercept[Exception](decode(extra, ignoreUnknown = false))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("surprise")))
  }

  test("null wire values decode to null (tombstone tolerance)") {
    val r = Seq(Option.empty[String]).toDF("j")
      .select(Serdes.payloadJsonValue(col("j"), rowDdl, Some("after"), unknownPropertiesIgnored = false).as("v"))
      .head()
    assert(r.isNullAt(0))
  }

  test("simple key unwraps the single field's value; bare scalars parse") {
    def key(json: String): Any =
      Seq(json).toDF("j")
        .select(Serdes.payloadJsonSimpleKey(col("j"), "bigint").as("k")).head().get(0)
    assert(key("""{"id": 42}""") === 42L)
    assert(key("""{"payload": {"order_number": 9}}""") === 9L) // name-agnostic
    assert(key("41") === 41L) // non-object key document
  }

  test("composite key parses the full object (payload-wrapped or bare)") {
    def key(json: String): Row =
      Seq(json).toDF("j")
        .select(Serdes.payloadJsonKey(col("j"), "a string, b bigint").as("k"))
        .select("k.*").head()
    assert(key("""{"a": "x", "b": 2}""") === Row("x", 2L))
    assert(key("""{"payload": {"a": "y", "b": 3}}""") === Row("y", 3L))
  }

  test("round trip: to_json → payloadJsonValue is lossless on the envelope") {
    val df = Seq((1L, "n1"), (2L, null)).toDF("id", "name")
    val wire = df.select(to_json(struct(
      lit(null).cast(s"struct<$rowDdl>").as("before"),
      struct(col("id"), col("name")).as("after"),
      struct(lit(9L).as("lsn")).as("source"),
      lit("c").as("op")), Map("ignoreNullFields" -> "false")).as("j"))
    // the DataFrame-level convenience decodes the column in place
    val back = Serdes.payloadJson(wire, "j", rowDdl, Some("after"))
      .select("j.*").orderBy("id").collect()
    assert(back.toSeq === Seq(Row(1L, "n1"), Row(2L, null)))
  }
}
