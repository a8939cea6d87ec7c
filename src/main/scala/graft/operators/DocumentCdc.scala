package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.GraftSqlShim.AbstractType
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Document-store (MongoDB-connector) CDC semantics, Spark-first.
  *
  * The reference's MongoDB connector emits change events whose payload is
  * a DOCUMENT — a JSON string, not a relational row — and ships a
  * dedicated SMT family to make those events consumable:
  *
  *  - `ExtractNewDocumentState` (reference
  *    `debezium-connector-mongodb/src/main/java/io/debezium/connector/mongodb/transforms/ExtractNewDocumentState.java:224-258`):
  *    full-document events pass `after` through; change-stream partial
  *    updates (null `after` + `updateDescription`) REBUILD the document
  *    by applying `updatedFields` over the pre-image and dropping
  *    `removedFields`, always ensuring `_id` from the key
  *    (`getPartialUpdateDocument`, `:355-392`); deletes follow the
  *    delete/tombstone handling modes, optionally rewritten with
  *    `__deleted` (+ `_id` when
  *    `delete.tombstone.handling.mode.rewrite-with-id`, `:246-252`).
  *  - `MongoDataConverter` array encoding (`MongoDataConverter.java:744-776`):
  *    `array.encoding=document` re-encodes every JSON array as a BSON-style
  *    document keyed `_0,_1,…` (`arrayElementStructName`).
  *  - `flatten.struct` + `flatten.struct.delimiter`
  *    (`ExtractNewDocumentState.java:118-134,388-391`): nested documents
  *    flatten into top-level properties with delimiter-joined names;
  *    partial-update dotted field names get the dot replaced by the
  *    delimiter.
  *  - BSON extended-JSON scalars (`MongoDataConverter.getObject`,
  *    `:784-860`): `$oid`/`$numberDecimal`/`$symbol` → string,
  *    `$numberLong`/`$numberInt`/`$numberDouble` → number, `$date` →
  *    epoch millis, `$binary` → its base64 payload.
  *
  * Spark mapping (semantics studied, not copied — the reference builds
  * Kafka Connect `Struct`s record-at-a-time from BSON; we stay columnar):
  * documents ride as Spark 4 VARIANT — `parse_json` → `cast(… as
  * map<string,variant>)` gives a schema-dynamic field map, the partial
  * update is declarative map algebra (`map_filter`/`map_concat`), and
  * [[DocumentCdc.canonicalJson]] re-serializes with SORTED KEYS at every
  * level (`to_json(variant)` sorts object keys), so document equality is
  * string equality — engine-portable and oracle-checkable. The two
  * structural re-encodings that need recursion over arbitrary nesting —
  * array→document and flatten — are codegen'd single-pass text kernels
  * ([[JsonDocOps]]), not UDFs, like the WKB and winnowing kernels.
  */
object JsonDocOps {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && isWs(s.charAt(i))) i += 1
    i
  }

  /** Index just past the closing quote of the string starting at `i0`
    * (`s(i0) == '"'`); escape-aware.
    */
  private def strEnd(s: String, i0: Int): Int = {
    var i = i0 + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    i
  }

  /** Index just past the JSON value starting at `i0` (string, object,
    * array, number, or literal).
    */
  private def valueEnd(s: String, i0: Int): Int = s.charAt(i0) match {
    case '"' => strEnd(s, i0)
    case '{' | '[' =>
      var depth = 0
      var i = i0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') i = strEnd(s, i)
        else {
          if (c == '{' || c == '[') depth += 1
          else if (c == '}' || c == ']') {
            depth -= 1
            if (depth == 0) return i + 1
          }
          i += 1
        }
      }
      i
    case _ =>
      var i = i0
      while (i < s.length && !isWs(s.charAt(i)) &&
        s.charAt(i) != ',' && s.charAt(i) != '}' && s.charAt(i) != ']') i += 1
      i
  }

  /** `array.encoding=document`: every JSON array becomes a document with
    * keys `_0,_1,…` (BSON-style; reference
    * `MongoDataConverter.arrayElementStructName`, `:775`). One streaming
    * pass; strings are escape-aware; insignificant whitespace is dropped
    * (canonical minified output).
    */
  def arrayToDocument(s: UTF8String): UTF8String = {
    val in = s.toString
    val n = in.length
    val sb = new java.lang.StringBuilder(n + (n >> 2) + 8)
    // context stack: -1 = object, >=0 = array with that element index current
    var stack = new Array[Int](8)
    var top = -1
    var pendingFirst = false
    var inStr = false
    def push(v: Int): Unit = {
      top += 1
      if (top == stack.length) stack = java.util.Arrays.copyOf(stack, stack.length * 2)
      stack(top) = v
    }
    var i = 0
    while (i < n) {
      val c = in.charAt(i)
      if (inStr) {
        sb.append(c)
        if (c == '\\') {
          if (i + 1 < n) { sb.append(in.charAt(i + 1)); i += 1 }
        } else if (c == '"') inStr = false
      } else if (isWs(c)) {
        // drop
      } else if (c == ']') {
        sb.append('}') // pendingFirst true here = empty array → "{}"
        if (top >= 0) top -= 1
        pendingFirst = false
      } else {
        if (pendingFirst) { sb.append("\"_0\":"); pendingFirst = false }
        c match {
          case '"' => inStr = true; sb.append('"')
          case '{' => push(-1); sb.append('{')
          case '}' => if (top >= 0) top -= 1; sb.append('}')
          case '[' => push(0); sb.append('{'); pendingFirst = true
          case ',' =>
            if (top >= 0 && stack(top) >= 0) {
              stack(top) += 1
              sb.append(",\"_").append(stack(top)).append("\":")
            } else sb.append(',')
          case other => sb.append(other)
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** `flatten.struct`: nested OBJECTS flatten into top-level properties
    * with delimiter-joined key paths (Connect `Flatten` semantics — the
    * reference applies it to the final record,
    * `ExtractNewDocumentState.java:330-333`). Arrays are values, not
    * structs: they pass through untouched (as do objects inside them).
    * Empty nested objects contribute no properties. Non-object input is
    * returned unchanged.
    */
  def flattenDoc(s: UTF8String, d: UTF8String): UTF8String = {
    val in = s.toString
    val delim = d.toString
    val start = skipWs(in, 0)
    if (start >= in.length || in.charAt(start) != '{') return s
    val sb = new java.lang.StringBuilder(in.length + 8)
    sb.append('{')
    walkObj(in, start, "", delim, sb)
    sb.append('}')
    UTF8String.fromString(sb.toString)
  }

  /** Emits the leaf entries of the object starting at `i0` into `sb`
    * (comma-managed against `sb`'s current content); returns the index
    * just past the object's closing brace.
    */
  private def walkObj(s: String, i0: Int, prefix: String, delim: String,
      sb: java.lang.StringBuilder): Int = {
    var i = skipWs(s, i0 + 1)
    if (i < s.length && s.charAt(i) == '}') return i + 1
    while (i < s.length) {
      val keyEnd = strEnd(s, i)
      val keyRaw = s.substring(i + 1, keyEnd - 1)
      i = skipWs(s, keyEnd)
      // s(i) == ':'
      i = skipWs(s, i + 1)
      if (i < s.length && s.charAt(i) == '{') {
        i = walkObj(s, i, prefix + keyRaw + delim, delim, sb)
      } else {
        val ve = valueEnd(s, i)
        if (sb.length() > 1) sb.append(',')
        sb.append('"').append(prefix).append(keyRaw).append("\":")
        sb.append(s, i, ve)
        i = ve
      }
      i = skipWs(s, i)
      if (i < s.length && s.charAt(i) == ',') i = skipWs(s, i + 1)
      else if (i < s.length && s.charAt(i) == '}') return i + 1
      else return i // malformed input: bail where we stand
    }
    i
  }

  /** BSON extended-JSON scalar normalization (reference
    * `MongoDataConverter.getObject`, `:784-860`): single-key `$…` wrapper
    * objects collapse to the plain JSON value the converter produces —
    * `$oid`/`$numberDecimal`/`$symbol` keep the quoted string,
    * `$numberLong`/`$numberInt`/`$numberDouble` unquote to a number,
    * `$date` yields epoch millis (both the relaxed numeric form and the
    * canonical `{"$date":{"$numberLong":"…"}}` nesting), `$binary` yields
    * its base64 payload string. Unknown `$…` wrappers and everything else
    * copy through verbatim (minus insignificant whitespace).
    */
  def normalizeExtendedJson(s: UTF8String): UTF8String = {
    val in = s.toString
    val sb = new java.lang.StringBuilder(in.length)
    normValue(in, skipWs(in, 0), sb)
    UTF8String.fromString(sb.toString)
  }

  /** Appends the normalized form of the value at `i0`; returns the index
    * just past it.
    */
  private def normValue(s: String, i0: Int, sb: java.lang.StringBuilder): Int = {
    if (i0 >= s.length) return i0
    s.charAt(i0) match {
      case '"' =>
        val e = strEnd(s, i0); sb.append(s, i0, e); e
      case '[' =>
        sb.append('[')
        var i = skipWs(s, i0 + 1)
        var first = true
        while (i < s.length && s.charAt(i) != ']') {
          if (!first) sb.append(',')
          first = false
          i = normValue(s, i, sb)
          i = skipWs(s, i)
          if (i < s.length && s.charAt(i) == ',') i = skipWs(s, i + 1)
        }
        sb.append(']')
        if (i < s.length) i + 1 else i
      case '{' =>
        // Peek: single-entry object with a $-key?
        val k0 = skipWs(s, i0 + 1)
        if (k0 < s.length && s.charAt(k0) == '"' && k0 + 1 < s.length && s.charAt(k0 + 1) == '$') {
          val kEnd = strEnd(s, k0)
          val key = s.substring(k0 + 1, kEnd - 1)
          val vStart = skipWs(s, skipWs(s, kEnd) + 1) // past ':'
          val tmp = new java.lang.StringBuilder
          val vEnd = normValue(s, vStart, tmp) // normalize inner first ($date canonical form)
          val after = skipWs(s, vEnd)
          if (after < s.length && s.charAt(after) == '}') {
            val inner = tmp.toString
            key match {
              case "$oid" | "$numberDecimal" | "$symbol" =>
                sb.append(inner) // quoted string kept
              case "$numberLong" | "$numberInt" | "$numberDouble" =>
                // strip the quotes: "123" → 123 (relaxed forms may already be
                // bare). NaN/±Infinity are not valid bare JSON tokens — they
                // stay quoted (the SpecialValueDecimal carrier, SURVEY §1.4),
                // so only a token that scans as a JSON number unquotes ("-Infinity"
                // starts with '-' but must NOT).
                if (isNumericToken(inner)) sb.append(inner, 1, inner.length - 1)
                else sb.append(inner)
              case "$date" =>
                sb.append(inner) // inner already normalized to epoch millis
              case "$binary" =>
                // canonical: {"$binary":{"base64":"…","subType":"…"}} → base64 string
                val b64 = extractField(inner, "base64")
                if (b64 != null) sb.append(b64) else { sb.append('{'); sb.append(key0Entry(key, inner)); sb.append('}') }
              case _ =>
                sb.append('{'); sb.append(key0Entry(key, inner)); sb.append('}')
            }
            return after + 1
          }
        }
        // regular object: normalize each value
        sb.append('{')
        var i = skipWs(s, i0 + 1)
        var first = true
        while (i < s.length && s.charAt(i) != '}') {
          if (!first) sb.append(',')
          first = false
          val kEnd = strEnd(s, i)
          sb.append(s, i, kEnd).append(':')
          i = skipWs(s, skipWs(s, kEnd) + 1)
          i = normValue(s, i, sb)
          i = skipWs(s, i)
          if (i < s.length && s.charAt(i) == ',') i = skipWs(s, i + 1)
        }
        sb.append('}')
        if (i < s.length) i + 1 else i
      case _ =>
        val e = valueEnd(s, i0); sb.append(s, i0, e); e
    }
  }

  private def key0Entry(key: String, innerJson: String): String =
    "\"" + key + "\":" + innerJson

  /** `"-12.5e3"` → true; `"NaN"`/`"-Infinity"`/bare `123` → false. True only
    * for a QUOTED token whose full content scans as a JSON number, so the
    * number wrappers can strip quotes without minting invalid bare tokens.
    */
  private def isNumericToken(inner: String): Boolean = {
    if (inner.length < 3 || inner.charAt(0) != '"' || inner.charAt(inner.length - 1) != '"')
      return false
    var i = 1
    val end = inner.length - 1
    if (inner.charAt(i) == '-') i += 1
    var digits = false
    while (i < end && inner.charAt(i) >= '0' && inner.charAt(i) <= '9') { i += 1; digits = true }
    if (!digits) return false
    if (i < end && inner.charAt(i) == '.') {
      i += 1
      while (i < end && inner.charAt(i) >= '0' && inner.charAt(i) <= '9') i += 1
    }
    if (i < end && (inner.charAt(i) == 'e' || inner.charAt(i) == 'E')) {
      i += 1
      if (i < end && (inner.charAt(i) == '+' || inner.charAt(i) == '-')) i += 1
      var expDigits = false
      while (i < end && inner.charAt(i) >= '0' && inner.charAt(i) <= '9') { i += 1; expDigits = true }
      if (!expDigits) return false
    }
    i == end
  }

  /** Pulls the quoted string value of `field` out of a (small, already
    * normalized) JSON object text; null if absent or not a string.
    */
  private def extractField(objJson: String, field: String): String = {
    val marker = "\"" + field + "\":"
    val at = objJson.indexOf(marker)
    if (at < 0) return null
    val vs = skipWs(objJson, at + marker.length)
    if (vs >= objJson.length || objJson.charAt(vs) != '"') return null
    objJson.substring(vs, strEnd(objJson, vs))
  }
}

object DocumentCdc {

  case class JsonArrayToDocument(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = StringType
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      JsonDocOps.arrayToDocument(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.JsonDocOps.arrayToDocument($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class JsonFlattenDoc(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def dataType: DataType = StringType
    override def inputTypes: Seq[AbstractType] = Seq(StringType, StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(s: Any, d: Any): Any =
      JsonDocOps.flattenDoc(s.asInstanceOf[UTF8String], d.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.operators.JsonDocOps.flattenDoc($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  case class JsonNormalizeExtended(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = StringType
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      JsonDocOps.normalizeExtendedJson(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.JsonDocOps.normalizeExtendedJson($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  private def c(e: Expression): Column = GraftSqlShim.column(e)
  private def x(col: Column): Expression = GraftSqlShim.expression(col)

  def json_array_to_document(doc: Column): Column = c(JsonArrayToDocument(x(doc)))
  def json_flatten_doc(doc: Column, delim: Column): Column =
    c(JsonFlattenDoc(x(doc), x(delim)))
  def json_normalize_extended(doc: Column): Column = c(JsonNormalizeExtended(x(doc)))

  // ---------------------------------------------------------------- //
  // Declarative document algebra over map<string,variant>             //
  // ---------------------------------------------------------------- //

  private val MapOfVariant = "map<string,variant>"

  /** JSON document text → field map (top-level keys → variant values). */
  def docMap(json: Column): Column = parse_json(json).cast(MapOfVariant)

  private def emptyDocMap: Column = parse_json(lit("{}")).cast(MapOfVariant)

  /** A plain string as a variant value (JSON-escaped through to_json). */
  private def stringVariant(s: Column): Column =
    variant_get(parse_json(to_json(struct(s.as("v")))), "$.v", "variant")

  private def jsonKey(k: Column): Column =
    concat(lit("\""), replace(replace(k, lit("\\"), lit("\\\\")), lit("\""), lit("\\\"")), lit("\":"))

  /** Deterministic document serialization: top-level keys sorted (binary
    * order), each value rendered by `to_json(variant)` — which itself
    * sorts nested object keys — so equal documents are equal STRINGS.
    */
  def canonicalJson(m: Column): Column =
    concat(lit("{"),
      concat_ws(",", transform(array_sort(map_keys(m)),
        k => concat(jsonKey(k), to_json(element_at(m, k))))),
      lit("}"))

  /** The partial-update document rebuild of
    * `ExtractNewDocumentState.getPartialUpdateDocument`
    * (`ExtractNewDocumentState.java:355-392`): pre-image fields,
    * overridden by `updatedFields`, minus `removedFields` (top-level
    * names, exactly like the reference's `keySet().remove`), with dotted
    * field names delimiter-replaced when flattening.
    */
  def applyUpdateDescription(before: Column, updatedFields: Column,
      removedFields: Column, flattenStruct: Boolean = false,
      delimiter: String = "_"): Column = {
    val b = coalesce(docMap(before), emptyDocMap)
    val u = coalesce(docMap(updatedFields), emptyDocMap)
    val merged = map_concat(map_filter(b, (k, _) => !map_contains_key(u, k)), u)
    val removed = when(removedFields.isNull, merged)
      .otherwise(map_filter(merged, (k, _) => !array_contains(removedFields, k)))
    if (flattenStruct) transform_keys(removed, (k, _) => replace(k, lit("."), lit(delimiter)))
    else removed
  }

  private def ensureId(m: Column, id: Column): Column =
    when(map_contains_key(m, "_id"), m)
      .otherwise(map_concat(m, map_from_arrays(array(lit("_id")), array(stringVariant(id)))))

  /** ExtractNewDocumentState over a document change-event DataFrame.
    *
    * Expected columns: `idCol` (plain string document id), `afterCol` /
    * `beforeCol` (JSON document text, nullable), `updatedCol` (JSON text
    * of `updateDescription.updatedFields`, nullable), `removedCol`
    * (array<string>, nullable). A row is a delete iff BOTH `after` and
    * `updatedFields` are null — the reference's structural test
    * (`ExtractNewDocumentState.java:227`). Adds a `doc` column with the
    * canonical JSON of the extracted document; `deleteMode`:
    *   - "drop"    → delete rows are removed;
    *   - "none"    → delete rows keep a null `doc`;
    *   - "rewrite" → every doc gains `__deleted`, deletes become the
    *     empty document (+ `_id` when `rewriteWithId`).
    */
  def extractNewDocumentState(df: DataFrame, idCol: String = "id",
      afterCol: String = "after", beforeCol: String = "before",
      updatedCol: String = "update_updated", removedCol: String = "update_removed",
      deleteMode: String = "rewrite", rewriteWithId: Boolean = false,
      arrayEncoding: String = "array", flattenStruct: Boolean = false,
      delimiter: String = "_"): DataFrame = {
    require(Set("drop", "none", "rewrite")(deleteMode), s"bad deleteMode $deleteMode")
    require(Set("array", "document")(arrayEncoding), s"bad arrayEncoding $arrayEncoding")
    val after = col(afterCol)
    val upd = col(updatedCol)
    val isDelete = after.isNull && upd.isNull
    val partial = applyUpdateDescription(col(beforeCol), upd, col(removedCol),
      flattenStruct, delimiter)
    val content = when(after.isNotNull, docMap(after))
      .when(upd.isNotNull, ensureId(partial, col(idCol)))
      .otherwise(emptyDocMap)
    val rewritten =
      if (deleteMode != "rewrite") content
      else {
        val flagged = map_concat(content,
          map_from_arrays(array(lit("__deleted")),
            array(parse_json(when(isDelete, "true").otherwise("false")))))
        if (rewriteWithId) ensureId(flagged, col(idCol)) else flagged
      }
    var doc = canonicalJson(rewritten)
    if (arrayEncoding == "document") doc = json_array_to_document(doc)
    if (flattenStruct) doc = json_flatten_doc(doc, lit(delimiter))
    if (deleteMode == "none") doc = when(isDelete, lit(null).cast("string")).otherwise(doc)
    val out = df.withColumn("doc", doc)
    if (deleteMode == "drop") out.where(!isDelete) else out
  }

  /** MongoEventRouter analog (reference
    * `debezium-connector-mongodb/.../transforms/outbox/MongoEventRouter.java`):
    * the outbox FIELDS live inside the document — route by the
    * aggregate-type field, key by the aggregate-id field, and (the
    * `expand.json.payload` behavior) expand the JSON payload sub-document
    * into typed columns via the declared DDL.
    */
  def documentOutboxRouter(df: DataFrame, docCol: String = "doc",
      routeField: String = "aggregatetype", keyField: String = "aggregateid",
      payloadField: String = "payload", payloadDdl: String,
      topicPrefix: String = "outbox.event."): DataFrame = {
    val v = parse_json(col(docCol))
    df.select(
      concat(lit(topicPrefix),
        variant_get(v, s"$$.$routeField", "string")).as("topic"),
      variant_get(v, s"$$.$keyField", "string").as("key"),
      from_json(to_json(variant_get(v, s"$$.$payloadField", "variant")),
        org.apache.spark.sql.types.StructType.fromDDL(payloadDdl)).as("payload"),
      col("*"))
  }
}
