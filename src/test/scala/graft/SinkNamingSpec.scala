package graft

import org.apache.spark.sql.functions._
import graft.merge.SinkModes
import graft.operators.Transforms

/** CollectionNameTransformation styling + sink field include/exclude
  * filter (`NamingStyleUtils` / `FieldFilterFactory` semantics).
  */
class SinkNamingSpec extends SparkSpec {
  import spark.implicits._

  private def styled(name: String, style: String): String =
    Seq(name).toDF("n").select(Transforms.styledColumn(col("n"), style)).head().getString(0)

  test("snake_case boundaries: lower→UPPER, letter↔digit, dots") {
    assert(styled("repoFiles.repo07", "snake_case") === "repo_files_repo_07")
    assert(styled("aB", "snake_case") === "a_b")
    assert(styled("AB", "snake_case") === "ab")
    assert(styled("a1b", "snake_case") === "a_1_b")
    assert(styled("x9y9", "snake_case") === "x_9_y_9")
    // lock-step with the driver-side static twin
    Seq("repoFiles.repo07", "aB", "AB", "a1b", "x9y9").foreach { n =>
      assert(styled(n, "snake_case") === Transforms.toSnakeCase(n))
    }
  }

  test("camelCase: first segment untouched, later segments capitalized") {
    assert(styled("repo_files.orders", "camel_case") === "repoFilesOrders")
    assert(styled("a__b", "camel_case") === "aB")
    assert(styled("single", "camel_case") === "single")
    assert(styled("tailCase_keepTail", "camel_case") === "tailCaseKeepTail")
    Seq("repo_files.orders", "a__b", "single").foreach { n =>
      assert(styled(n, "camel_case") === Transforms.toCamelCase(n))
    }
  }

  test("collectionNameTransformation: prefix/suffix, null routes pass through") {
    val df = Seq(Some("myTable"), None).toDF("__route")
    val out = Transforms.collectionNameTransformation(
      df, style = "snake_case", prefix = "dw_", suffix = "_v1")
      .select("__route").collect().map(r => Option(r.getString(0))).toSet
    assert(out === Set(Some("dw_my_table_v1"), None))
  }

  test("field filter: topic-qualified entries, exclude precedence, defaults") {
    val inc = SinkModes.fieldFilter(includeList = "t1:a, b")
    assert(inc("t1", "a") && inc("t2", "b") && !inc("t2", "a") && !inc("t1", "c"))
    val exc = SinkModes.fieldFilter(excludeList = "t1:a, b")
    assert(!exc("t1", "a") && exc("t2", "a") && !exc("t2", "b") && exc("t1", "c"))
    // exclude wins when both configured (FieldFilterFactory.createFieldFilter)
    val both = SinkModes.fieldFilter(includeList = "a", excludeList = "a")
    assert(!both("t", "a") && both("t", "z"))
    val none = SinkModes.fieldFilter()
    assert(none("t", "anything"))
    // malformed entries fail loudly instead of re-parsing as something else
    intercept[IllegalArgumentException](SinkModes.fieldFilter(excludeList = "orders:"))
    intercept[IllegalArgumentException](SinkModes.fieldFilter(includeList = ":field"))
    intercept[IllegalArgumentException](SinkModes.fieldFilter(excludeList = "a:b:c"))
  }

  test("plan shape: serde decode, styling, field filter, semantic convert are shuffle-free") {
    import graft.core.SemanticTypes
    import graft.operators.Serdes
    val df = Seq((1L, """{"payload":{"id":1,"name":"x"}}""", "myTable", 37230123))
      .toDF("k", "wire", "__route", "ms")
    val out = Transforms.collectionNameTransformation(
      SinkModes.projectFields(
        df.withColumn("decoded", Serdes.payloadJsonValue(col("wire"), "id bigint, name string"))
          .withColumn("t_us", SemanticTypes.toSpark(col("ms"), SemanticTypes.Time)),
        "c1", SinkModes.fieldFilter(excludeList = "c1:ms"), keepAlways = Seq("k")),
      style = "snake_case")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"decode/style/filter operators must be narrow projections:\n$plan")
  }

  test("projectFields: static projection keeps keepAlways columns") {
    val df = Seq(("r", "p", "c", "l")).toDF("repo", "path", "commit", "lang")
    val f = SinkModes.fieldFilter(excludeList = "files:lang, repo")
    val out = SinkModes.projectFields(df, "files", f)
    assert(out.columns.toSeq === Seq("repo", "path", "commit")) // repo kept: key
  }
}
