package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Transforms
import graft.streaming.CdcPipeline
import graft.table.LakeTable

/** Ordered post-processor chain (round-4; reference
  * `processors/PostProcessorRegistry.java:29` — an ordered, pluggable
  * registry applied to every emitted record): `CdcPipeline.start`'s
  * `postProcessors` and `MultiTable.TableDef.postProcessors` compose
  * `DataFrame => DataFrame` hooks in declared order inside the streaming
  * apply path.
  */
class PostProcessorSpec extends SparkSpec {
  import spark.implicits._

  test("streaming chain: reselect + custom processor compose in declared order") {
    val root = Files.createTempDirectory("pp-stream").toString
    val inDir = s"$root/in"; val ckpt = s"$root/ckpt"
    val table = new LakeTable(s"$root/table", numBuckets = 4)

    // wave 1 seeds full content into the sink state
    val wave1 = (1 to 24).map(i => FlatEvent.mk((s"repo${i % 3}", s"p${i % 6}.txt"), i.toLong, "c"))
    graft.core.Envelope.wrap(wave1.toDF()).write.mode("append").parquet(inDir)
    CdcPipeline.start(spark, inDir, ckpt, table).awaitTermination()

    // wave 2 carries TOAST-style placeholders; the chain is
    //   1. reselect: patch placeholders from the CURRENT sink state
    //      (the ReselectColumnsPostProcessor semantics — state read at
    //      batch time, which is exactly what the registry hook sees)
    //   2. custom: annotate lang AFTER reselect — order-observable,
    //      because running it first would tag rows the reselect then
    //      overwrites
    val chain: Seq[DataFrame => DataFrame] = Seq(
      df => Transforms.reselectColumns(
        df, table.snapshot(spark).get, Seq("content"), "__unavailable__"),
      df => df.withColumn("lang", concat(col("lang"), lit("+pp"))))
    val wave2 = (1 to 24).map { i =>
      val e = FlatEvent.mk((s"repo${i % 3}", s"p${i % 6}.txt"), 100L + i, "u")
      if (i % 2 == 0) e.copy(content = "__unavailable__") else e
    }
    graft.core.Envelope.wrap(wave2.toDF()).write.mode("append").parquet(inDir)
    CdcPipeline.start(spark, inDir, ckpt, table, postProcessors = chain).awaitTermination()

    val state = table.snapshot(spark).get.collect().map(r =>
      (r.getAs[String]("repo"), r.getAs[String]("path")) ->
        (r.getAs[String]("lang"), r.getAs[String]("content"))).toMap
    assert(state.nonEmpty)
    state.foreach { case (key, (lang, content)) =>
      assert(lang == "scala+pp", s"$key: custom processor must run (got lang=$lang)")
      assert(content != "__unavailable__", s"$key: placeholder must be reselected from state")
      assert(content != null && content.startsWith("content "), s"$key: content corrupted: $content")
    }
    // placeholder rows were patched from WAVE-1 state (lsn ≤ 24), not wave 2
    val patched = state.collect { case (_, (_, c)) if c.matches(".*@\\d+") => c }
    assert(patched.exists(_.matches(".*@([1-9]|1[0-9]|2[0-4])$")),
      "some winner must carry wave-1 content via the reselect patch")
  }

  test("per-table chains in the routed catalog apply independently") {
    import graft.merge.MultiTable
    val root = Files.createTempDirectory("pp-mt").toString
    val reg = new MultiTable.Registry(root, Seq(
      MultiTable.TableDef("a", numBuckets = 2,
        postProcessors = Seq(df => df.withColumn("lang", upper(col("lang"))))),
      MultiTable.TableDef("b", numBuckets = 2))) // no chain
    val batch = (1 to 20).map(i => FlatEvent.mk((s"repo$i", s"f$i.txt"), i.toLong, "c")).toDF()
      .withColumn("__route", when(col("lsn") % 2 === 0, lit("a")).otherwise(lit("b")))
    MultiTable.applyBatch(spark, reg, batch, "__route", batchId = 0L)
    val aLangs = reg("a").snapshot(spark).get.select("lang").distinct().as[String].collect().toSet
    val bLangs = reg("b").snapshot(spark).get.select("lang").distinct().as[String].collect().toSet
    assert(aLangs === Set("SCALA"), "table a's chain must apply")
    assert(bLangs === Set("scala"), "table b must be untouched")
  }
}
