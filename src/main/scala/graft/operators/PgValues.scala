package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.GraftSqlShim.AbstractType
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL hstore value handling — `hstore.handling.mode`
  * (`PostgresConnectorConfig.HStoreHandlingMode`; conversion
  * `PostgresValueConverter.java:387-396,779-815`: the wire value is
  * hstore TEXT `"k"=>"v", "k2"=>NULL`, parsed to a map and emitted
  * either as a JSON string — `Json.builder()` schema — or as a Connect
  * map with non-null string keys and nullable string values). Semantics
  * studied, not copied.
  *
  * Spark-first: the text→JSON conversion is a codegen'd single-pass
  * Catalyst kernel (the [[JsonDocOps]] discipline — escape-aware
  * scanning that map algebra can't express); mode=map composes the
  * kernel with `from_json` (`map<string,string>`), so both modes stay
  * inside whole-stage codegen with no UDF.
  *
  * Deviation, documented: the reference serializes in hstore iteration
  * order (Jackson over `HStoreConverter.fromString`'s HashMap — i.e.
  * UNSPECIFIED order); this kernel emits keys SORTED, the engine's
  * canonical-JSON convention (`DocumentCdc.canonicalJson`), so document
  * equality is string equality for oracles and dedup. Duplicate keys
  * keep the FIRST occurrence (PG's own `'a=>1,a=>2'::hstore` rule).
  */
object PgValues {

  /** hstore text → canonical (sorted-key) JSON; malformed input → null. */
  def hstoreToJson(s: UTF8String): UTF8String = {
    val t = s.toString
    val n = t.length
    var i = 0
    def skipWs(): Unit = while (i < n && Character.isWhitespace(t.charAt(i))) i += 1
    // at an opening quote: returns the unescaped content, or null if unterminated
    def quoted(): String = {
      val sb = new java.lang.StringBuilder
      i += 1
      while (i < n && t.charAt(i) != '"') {
        val c = t.charAt(i)
        if (c == '\\' && i + 1 < n) { sb.append(t.charAt(i + 1)); i += 2 }
        else { sb.append(c); i += 1 }
      }
      if (i >= n) null
      else { i += 1; sb.toString }
    }
    val pairs = new java.util.TreeMap[String, String]() // sorted keys
    skipWs()
    while (i < n) {
      if (t.charAt(i) != '"') return null
      val k = quoted()
      if (k == null) return null
      skipWs()
      if (i + 1 >= n || t.charAt(i) != '=' || t.charAt(i + 1) != '>') return null
      i += 2; skipWs()
      var v: String = null
      var isNull = false
      if (i < n && t.charAt(i) == '"') {
        v = quoted()
        if (v == null) return null
      } else if (i + 4 <= n && t.regionMatches(true, i, "NULL", 0, 4)) {
        isNull = true; i += 4
      } else return null
      if (!pairs.containsKey(k)) pairs.put(k, if (isNull) null else v)
      skipWs()
      if (i < n) {
        if (t.charAt(i) != ',') return null
        i += 1; skipWs()
        if (i >= n) return null // trailing comma
      }
    }
    val sb = new java.lang.StringBuilder("{")
    val it = pairs.entrySet().iterator()
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) sb.append(',')
      first = false
      jsonEsc(sb, e.getKey); sb.append(':')
      if (e.getValue == null) sb.append("null") else jsonEsc(sb, e.getValue)
    }
    UTF8String.fromString(sb.append('}').toString)
  }

  private def jsonEsc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  case class HstoreToJson(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = StringType
    override def inputTypes: Seq[AbstractType] = Seq(StringType)
    override def nullIntolerant: Boolean = true
    override protected def nullSafeEval(v: Any): Any =
      hstoreToJson(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.operators.PgValues.hstoreToJson($c)")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** hstore text column → canonical JSON string (mode=json). */
  def hstore_to_json(c: Column): Column =
    GraftSqlShim.column(HstoreToJson(GraftSqlShim.expression(c)))

  /** hstore text column → `map<string,string>` with nullable values
    * (mode=map, the Connect `map(STRING, OPTIONAL_STRING)` schema).
    */
  def hstore_to_map(c: Column): Column =
    from_json(hstore_to_json(c), org.apache.spark.sql.types.MapType(
      StringType, StringType, valueContainsNull = true))

  /** `hstore.handling.mode` applied to a set of columns: json | map. */
  def hstoreHandling(df: DataFrame, columns: Seq[String], mode: String): DataFrame = {
    val conv: Column => Column = mode match {
      case "json" => hstore_to_json
      case "map"  => hstore_to_map
      case other => throw new IllegalArgumentException(
        s"hstore.handling.mode must be json or map, got: $other")
    }
    columns.foldLeft(df)((d, c) => d.withColumn(c, conv(col(c))))
  }
}
