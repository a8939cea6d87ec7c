package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.CdcPipeline
import graft.table.LakeTable

/** `LakeTable.lookupJoin` — the above-cap serving path `lookupMany`'s
  * error message points at (round-4 VERDICT item 6): an arbitrary keys
  * DataFrame served by a bucket-pruned state semi-join.
  */
class LookupJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(n: Int, buckets: Int = 8): LakeTable = {
    val t = new LakeTable(Files.createTempDirectory("lookupjoin").toString, numBuckets = buckets)
    val events = (1 to n).map(i =>
      FlatEvent.mk((s"repo${i % 50}", s"f$i.txt"), i.toLong, if (i % 11 == 0) "d" else "c"))
    CdcPipeline.replay(spark, events.toDF(), t, numBatches = 2, writeMetrics = false)
    t
  }

  test("a keys frame far above MaxLookupKeys returns exactly the matching live rows") {
    val t = mkTable(5000)
    // 2500 keys (every even i) — 2.4× the 1024 lookupMany cap; a third of
    // them absent (deleted or never written) to prove no widening
    val keys = (2 to 6000 by 2).map(i => (s"repo${i % 50}", s"f$i.txt")).toDF("repo", "path")
    assert(keys.count() > LakeTable.MaxLookupKeys)
    val got = t.lookupJoin(spark, keys).get
      .select("repo", "path", "lsn").as[(String, String, Long)].collect().toSet
    val expected = t.snapshot(spark).get
      .where(pmod(regexp_extract(col("path"), "f([0-9]+)", 1).cast("int"), lit(2)) === 0)
      .select("repo", "path", "lsn").as[(String, String, Long)].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty)
    assert(got.forall { case (_, p, _) => p.stripPrefix("f").stripSuffix(".txt").toInt % 11 != 0 },
      "deleted keys must not resurface")
  }

  test("duplicate and null key rows are tolerated; equivalence with lookupMany below the cap") {
    val t = mkTable(400)
    val keySeq = Seq[(String, String)](("repo1", "f101.txt"), ("repo2", "f102.txt"), ("repo3", "f3.txt"))
    val dirty = (keySeq ++ keySeq).toDF("repo", "path")
      .unionAll(Seq((null.asInstanceOf[String], "fX.txt")).toDF("repo", "path"))
    val viaJoin = t.lookupJoin(spark, dirty).get
      .select("repo", "path", "lsn").as[(String, String, Long)].collect().toSet
    val viaMany = t.lookupMany(spark, keySeq.map(k => Seq[Any](k._1, k._2))).get
      .select("repo", "path", "lsn").as[(String, String, Long)].collect().toSet
    assert(viaJoin === viaMany)
    assert(viaJoin.nonEmpty)
  }

  test("buckets no key maps to are never scanned") {
    val t = mkTable(4000, buckets = 16)
    val total = t.snapshot(spark).get.count()
    // single-key frame → exactly one touched bucket; the scan must read
    // ~1/16th of the state, not the table
    val read = recordsRead {
      t.lookupJoin(spark, Seq(("repo1", "f101.txt")).toDF("repo", "path")).get.count()
    }
    assert(read > 0, "positive control: the touched bucket IS scanned")
    assert(read < total / 4,
      s"single-bucket lookup read $read of $total rows — bucket pruning is off")
  }

  test("keys frame column order is free; a wrong column set fails loudly") {
    val t = mkTable(500)
    val keys = Seq(("f101.txt", "repo1"), ("f205.txt", "repo5")).toDF("path", "repo")
    val got = t.lookupJoin(spark, keys).get.select("path").as[String].collect().toSet
    assert(got === Set("f101.txt", "f205.txt"))
    val bad = Seq(("a", "b")).toDF("repo", "file")
    val ex = intercept[IllegalArgumentException](t.lookupJoin(spark, bad))
    assert(ex.getMessage.contains("key columns"))
  }
}
