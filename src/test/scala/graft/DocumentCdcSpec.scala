package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.operators.{DocumentCdc, JsonDocOps}
import graft.sources.DocumentLog

/** Document-store (MongoDB connector) CDC: ExtractNewDocumentState,
  * MongoDataConverter array/extended-JSON encodings, flatten.struct.
  */
class DocumentCdcSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def ad(s: String): String =
    JsonDocOps.arrayToDocument(UTF8String.fromString(s)).toString
  private def fl(s: String, d: String = "_"): String =
    JsonDocOps.flattenDoc(UTF8String.fromString(s), UTF8String.fromString(d)).toString
  private def nx(s: String): String =
    JsonDocOps.normalizeExtendedJson(UTF8String.fromString(s)).toString

  // ------------------------------------------------------------ kernels

  test("arrayToDocument: BSON-style _0/_1 keys, nesting, empties, strings") {
    assert(ad("""{"a":[1,2,3]}""") === """{"a":{"_0":1,"_1":2,"_2":3}}""")
    assert(ad("""{"a":[1,{"b":[2,3]},[]],"d":[]}""") ===
      """{"a":{"_0":1,"_1":{"b":{"_0":2,"_1":3}},"_2":{}},"d":{}}""")
    // brackets/commas INSIDE strings are data, not structure
    assert(ad("""{"s":"x[,]y","t":["a,b","c\"[d"]}""") ===
      """{"s":"x[,]y","t":{"_0":"a,b","_1":"c\"[d"}}""")
    // top-level array; whitespace dropped (canonical minified)
    assert(ad("""[ 1 , [2] ]""") === """{"_0":1,"_1":{"_0":2}}""")
    assert(ad("""{"a": []}""") === """{"a":{}}""")
  }

  test("flattenDoc: delimiter-joined keys; arrays and their contents untouched") {
    assert(fl("""{"a":{"b":1,"c":{"d":2}},"e":3}""") ===
      """{"a_b":1,"a_c_d":2,"e":3}""")
    // arrays are VALUES (Connect Flatten flattens structs only)
    assert(fl("""{"a":{"b":[1,{"c":2}]},"d":[{"e":3}]}""") ===
      """{"a_b":[1,{"c":2}],"d":[{"e":3}]}""")
    // empty nested objects contribute nothing; strings with braces survive
    assert(fl("""{"a":{},"b":{"c":{}},"d":"{x},[y]"}""") === """{"d":"{x},[y]"}""")
    assert(fl("""{"a":{"b":1}}""", ".") === """{"a.b":1}""")
    // non-object input passes through
    assert(fl("""[1,2]""") === """[1,2]""")
  }

  test("normalizeExtendedJson: MongoDataConverter scalar wrappers") {
    assert(nx("""{"_id":{"$oid":"abc"}}""") === """{"_id":"abc"}""")
    assert(nx("""{"n":{"$numberLong":"42"},"i":{"$numberInt":"7"},"f":{"$numberDouble":"1.5"}}""") ===
      """{"n":42,"i":7,"f":1.5}""")
    assert(nx("""{"p":{"$numberDecimal":"10.25"}}""") === """{"p":"10.25"}""")
    // $date: relaxed numeric AND canonical nested $numberLong both → millis
    assert(nx("""{"d":{"$date":1700000000000}}""") === """{"d":1700000000000}""")
    assert(nx("""{"d":{"$date":{"$numberLong":"1700000000000"}}}""") ===
      """{"d":1700000000000}""")
    assert(nx("""{"b":{"$binary":{"base64":"QUJD","subType":"00"}}}""") ===
      """{"b":"QUJD"}""")
    // wrappers nest inside arrays and plain objects; unknown $-keys pass through
    assert(nx("""{"a":[{"$numberInt":"1"},{"x":{"$oid":"ff"}}],"u":{"$regex":"p"}}""") ===
      """{"a":[1,{"x":"ff"}],"u":{"$regex":"p"}}""")
    // NaN/±Infinity are not bare JSON tokens — they stay quoted
    assert(nx("""{"f":{"$numberDouble":"NaN"},"g":{"$numberDouble":"-Infinity"},"h":{"$numberDouble":"-1.5"}}""") ===
      """{"f":"NaN","g":"-Infinity","h":-1.5}""")
  }

  // Reference implementation over a tiny JSON ADT: the ScalaCheck twin of
  // the text kernels (independent of the scanner — structural recursion).
  private sealed trait JV
  private case class JObj(fields: List[(String, JV)]) extends JV
  private case class JArr(items: List[JV]) extends JV
  private case class JStr(s: String) extends JV
  private case class JNum(n: Long) extends JV
  private case class JBool(b: Boolean) extends JV
  private case object JNull extends JV

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def render(v: JV): String = v match {
    case JObj(fs) => fs.map { case (k, x) => s""""${esc(k)}":${render(x)}""" }.mkString("{", ",", "}")
    case JArr(xs) => xs.map(render).mkString("[", ",", "]")
    case JStr(s) => s""""${esc(s)}""""
    case JNum(n) => n.toString
    case JBool(b) => b.toString
    case JNull => "null"
  }
  private def adRef(v: JV): JV = v match {
    case JObj(fs) => JObj(fs.map { case (k, x) => (k, adRef(x)) })
    case JArr(xs) => JObj(xs.zipWithIndex.map { case (x, i) => (s"_$i", adRef(x)) })
    case other => other
  }
  private def flRef(v: JV, delim: String): JV = v match {
    case JObj(fs) =>
      def leaves(prefix: String, o: JObj): List[(String, JV)] = o.fields.flatMap {
        case (k, nested: JObj) => leaves(prefix + k + delim, nested)
        case (k, x) => List((prefix + k, x))
      }
      JObj(leaves("", JObj(fs)))
    case other => other
  }

  private val keyGen = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(5)).suchThat(_.nonEmpty),
    Gen.const("""k"q"""), Gen.const("""k\s"""), Gen.const("k é"))
  private val strGen = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.const("""x[,]{}"esc"\ y"""), Gen.const("tab\tnl\n"), Gen.const(""))
  private def jvGen(depth: Int): Gen[JV] =
    if (depth <= 0) Gen.oneOf(strGen.map(JStr), Gen.choose(-99L, 99L).map(JNum),
      Gen.oneOf(JBool(true), JBool(false), JNull))
    else Gen.frequency(
      (3, strGen.map(JStr)),
      (2, Gen.choose(-99L, 99L).map(JNum)),
      (1, Gen.const(JNull)),
      (2, Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, jvGen(depth - 1)).map(JArr(_)))),
      (2, Gen.choose(0, 3).flatMap(n =>
        Gen.listOfN(n, Gen.zip(keyGen, jvGen(depth - 1))).map(fs => JObj(fs)))))
  private val docGen: Gen[JObj] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.zip(keyGen, jvGen(2))).map(JObj(_)))

  private def check(p: Prop): Unit = {
    val r = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("property: text kernels == structural-recursion reference on random docs") {
    check(Prop.forAll(docGen) { doc =>
      ad(render(doc)) == render(adRef(doc)) && fl(render(doc), "_") == render(flRef(doc, "_"))
    })
  }

  // ---------------------------------------------- extractNewDocumentState

  private def mkEvents(rows: Seq[(String, String, String, String, Seq[String])]) =
    rows.toDF("id", "after", "before", "update_updated", "update_removed")

  test("partial update: updatedFields override, removedFields drop, _id ensured") {
    val ev = mkEvents(Seq(
      ("k1", null, """{"_id":"k1","a":1,"b":"x","t":[1]}""", """{"b":"y","c":3}""", Seq("t")),
      // null pre-image (no full document available): update still applies
      ("k2", null, null, """{"a":7}""", null)))
    val out = DocumentCdc.extractNewDocumentState(ev, deleteMode = "none")
      .select("id", "doc").as[(String, String)].collect().toMap
    assert(out("k1") === """{"_id":"k1","a":1,"b":"y","c":3}""")
    assert(out("k2") === """{"_id":"k2","a":7}""")
  }

  test("delete modes: drop removes, none keeps null doc, rewrite flags + _id") {
    val ev = mkEvents(Seq(
      ("k1", """{"_id":"k1","a":1}""", null, null, null),
      ("kd", null, """{"_id":"kd","a":2}""", null, null))) // delete: after+updated null
    assert(DocumentCdc.extractNewDocumentState(ev, deleteMode = "drop").count() === 1)
    val none = DocumentCdc.extractNewDocumentState(ev, deleteMode = "none")
      .select("id", "doc").as[(String, String)].collect().toMap
    assert(none("kd") === null && none("k1") === """{"_id":"k1","a":1}""")
    val rw = DocumentCdc.extractNewDocumentState(ev,
      deleteMode = "rewrite", rewriteWithId = true)
      .select("id", "doc").as[(String, String)].collect().toMap
    assert(rw("kd") === """{"__deleted":true,"_id":"kd"}""")
    assert(rw("k1") === """{"__deleted":false,"_id":"k1","a":1}""")
  }

  test("flatten.struct: dotted partial-update field names take the delimiter") {
    val ev = mkEvents(Seq(
      ("k1", null, """{"_id":"k1","m":{"x":1}}""", """{"m.y":2}""", null)))
    val out = DocumentCdc.extractNewDocumentState(ev, deleteMode = "none",
      flattenStruct = true, delimiter = "_")
      .select("doc").as[String].head()
    // pre-image m flattens (m_x), the dotted updated key renames (m_y)
    assert(out === """{"_id":"k1","m_x":1,"m_y":2}""")
  }

  test("canonical serialization sorts keys and escapes them") {
    val ev = mkEvents(Seq(("k1", """{"z":1,"a":{"y":2,"b":3},"q\"k":4}""", null, null, null)))
    val out = DocumentCdc.extractNewDocumentState(ev, deleteMode = "none")
      .select("doc").as[String].head()
    assert(out === """{"a":{"b":3,"y":2},"q\"k":4,"z":1}""")
  }

  test("array.encoding=document + flatten compose over the extracted doc") {
    val ev = mkEvents(Seq(("k1", """{"_id":"k1","m":{"t":[5,6]}}""", null, null, null)))
    val out = DocumentCdc.extractNewDocumentState(ev, deleteMode = "none",
      arrayEncoding = "document", flattenStruct = true)
      .select("doc").as[String].head()
    assert(out === """{"_id":"k1","m_t__0":5,"m_t__1":6}""")
  }

  test("events grid: partial updates converge to the same state as full capture") {
    // Replaying q98's extracted docs per key by lsn must yield, for every
    // surviving key, the v-th full document — i.e. partial-update rebuild
    // loses nothing vs full-document capture.
    val ev = DocumentLog.events(spark, sfDir)
    val out = DocumentCdc.extractNewDocumentState(ev, deleteMode = "none")
    val winners = out.where(col("doc").isNotNull)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy(desc("lsn"))))
      .where(col("rn") === 1)
    // keys whose final event was a FULL capture vs partial: both rebuild
    // commit = c<lpad(lsn)> — check the invariant directly
    val bad = winners.where(
      get_json_object(col("doc"), "$.commit") =!=
        concat(lit("c"), lpad(col("lsn").cast("string"), 10, "0"))).count()
    assert(bad === 0)
  }

  test("documentOutboxRouter: route, key, payload expansion") {
    val docs = Seq(
      """{"_id":"a","aggregateid":"a","aggregatetype":"orders","event_type":"e","payload":{"head":"h1","len":3}}""")
      .toDF("doc")
    val out = DocumentCdc.documentOutboxRouter(docs, payloadDdl = "head string, len int")
    val row = out.select("topic", "key", "payload.head", "payload.len").head()
    assert(row.getString(0) === "outbox.event.orders")
    assert(row.getString(1) === "a")
    assert(row.getString(2) === "h1" && row.getInt(3) === 3)
  }

  test("kernels stay shuffle-free (narrow plan, no Exchange)") {
    val full = DocumentLog.events(spark, sfDir).where(col("after").isNotNull)
    val plan = DocumentCdc.extractNewDocumentState(full, deleteMode = "rewrite",
      arrayEncoding = "document", flattenStruct = true)
      .queryExecution.executedPlan.toString
    // the events grid broadcasts its 3-row version dimension (fine); the
    // document extraction itself must add NO shuffle
    assert("(?<!Broadcast)Exchange".r.findAllMatchIn(plan).isEmpty, plan)
  }
}
