package graft

import org.apache.spark.sql.functions._
import graft.tdp.{Cleaning, Corpus, Dedup, Multimodal, Similarity, TextAnalysis}

/** Training-data pipeline operators: dedup family, similarity search,
  * text analysis, multimodal plumbing. Uses the sf0.001 corpus with
  * planted exact dups (doc_id%7 → +2000000) and near dups
  * (doc_id%5 → +1000000, tail appended); see [[Corpus]].
  */
class TdpSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val corpus = Corpus.docsWithDups(spark, sf).cache()
  private lazy val embs = Corpus.embsWithDups(spark, sf).cache()

  test("exact dedup: planted exact copies collapse onto the lowest doc_id") {
    val groups = Dedup.exactGroups(corpus)
    val dupGroups = groups.where(col("copies") >= 2)
    // every doc_id%7 plant produces a >=2 group canonicalized to the original id
    val planted = corpus.where(col("doc_id") >= 2000000L).count()
    assert(dupGroups.count() >= planted)
    assert(dupGroups.where(col("canonical_id") >= 2000000L).count() === 0)
    val kept = Dedup.exact(corpus)
    assert(kept.count() === groups.count()) // one survivor per sha group
    assert(kept.where(col("doc_id") >= 2000000L).count() === 0)
  }

  test("minhash LSH: finds planted exact and near dup pairs, no self-pairs") {
    val pairs = Dedup.minhashLsh(corpus, bands = 4, rowsPerBand = 4, threshold = 0.7).cache()
    val asSet = pairs.select("a", "b").as[(Long, Long)].collect().toSet
    // exact dups must collide in every band (est_jaccard = 1.0)
    val exactPlants = corpus.where(col("doc_id") >= 2000000L)
      .select((col("doc_id") - 2000000L).as("a"), col("doc_id").as("b")).as[(Long, Long)].collect()
    exactPlants.foreach { p => assert(asSet.contains(p), s"missing exact pair $p") }
    // near dups (tail append) keep high jaccard; expect most to be found
    val nearPlants = corpus.where(col("doc_id") >= 1000000L && col("doc_id") < 2000000L).count()
    val nearFound = pairs.where(col("b") >= 1000000L && col("b") < 2000000L && col("a") === col("b") - 1000000L).count()
    assert(nearFound >= nearPlants * 8 / 10, s"found $nearFound of $nearPlants near pairs")
    assert(pairs.where(col("a") === col("b")).count() === 0)
    assert(pairs.where(col("est_jaccard") < 0.7).count() === 0)
  }

  test("simhash: identical fingerprints for exact dups; 64-bit bitstring") {
    val fp = corpus.select(col("doc_id"), Dedup.simhash(col("text")).as("fp")).cache()
    assert(fp.where(length(col("fp")) =!= 64).count() === 0)
    val joined = fp.where(col("doc_id") >= 2000000L).select((col("doc_id") - 2000000L).as("doc_id"), col("fp").as("fp2"))
      .join(fp, "doc_id")
    assert(joined.where(col("fp") =!= col("fp2")).count() === 0)
  }

  test("simhash pairs: segment banding finds every hamming<=3 pair, exact plants at 0") {
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 3).cache()
    assert(pairs.where(col("a") === col("b")).count() === 0)
    assert(pairs.where(col("hamming") > 3).count() === 0)
    // exact plants have identical fingerprints → hamming 0, always found
    val exactPlants = corpus.where(col("doc_id") >= 2000000L).count()
    val exactFound = pairs.where(col("b") - col("a") === 2000000L && col("hamming") === 0).count()
    assert(exactFound === exactPlants, s"found $exactFound of $exactPlants exact plants")
    // completeness vs brute force on a sample: banding (pigeonhole) must
    // find EVERY pair within hamming 3
    val fp = corpus.where(col("doc_id") < 300)
      .select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .as[(Long, String)].collect()
    val brute = (for {
      (a, fa) <- fp; (b, fb) <- fp if a < b
      h = fa.zip(fb).count { case (x, y) => x != y } if h <= 3
    } yield (a, b)).toSet
    val banded = pairs.where(col("a") < 300 && col("b") < 300)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(brute.subsetOf(banded), s"banding missed ${brute -- banded}")
  }

  test("n-gram jaccard: exact dup pairs at 1.0; near dups above threshold") {
    val pairs = Dedup.ngramJaccardPairs(corpus, threshold = 0.6).cache()
    val exact = pairs.where(col("b") - col("a") === 2000000L)
    assert(exact.where(col("jaccard") =!= 1.0).count() === 0)
    val exactPlants = corpus.where(col("doc_id") >= 2000000L).count()
    assert(exact.count() === exactPlants)
    val near = pairs.where(col("b") - col("a") === 1000000L)
    assert(near.count() > 0)
    assert(near.agg(min("jaccard")).as[Double].head() >= 0.6)
  }

  test("embedding cosine near-dup: scaled plants detected at cos≈1 in same LSH bucket") {
    val pairs = Dedup.embeddingCosinePairs(embs, threshold = 0.98, planes = 6).cache()
    val plants = embs.where(col("vec_id") >= 1000000L).count()
    val found = pairs.where(col("b") - col("a") === 1000000L && col("cos") >= 0.9999).count()
    assert(found === plants, s"found $found of $plants scaled plants")
  }

  test("SemDeDup: plants co-cluster; exactly one survivor per cluster, farthest from centroid") {
    val dec = Dedup.semDedup(embs, nlist = 8, threshold = 0.98).cache()
    // every planted (v, 1.01·v) pair lands in one semantic cluster
    val plants = embs.where(col("vec_id") >= 1000000L)
      .select(col("vec_id") - 1000000L).as[Long].collect().toSet
    val byDoc = dec.select("doc", "cluster").as[(Long, Long)].collect().toMap
    plants.foreach { p =>
      assert(byDoc.contains(p) && byDoc.contains(p + 1000000L) &&
        byDoc(p) === byDoc(p + 1000000L), s"plant pair ($p, ${p + 1000000L}) not co-clustered")
    }
    // exactly one keep per cluster
    val badKeeps = dec.groupBy("cluster")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("k"))
      .where(col("k") =!= 1).count()
    assert(badKeeps === 0L)
    // the survivor is the min-(ccos, doc) member — the paper's
    // keep-the-farthest-from-centroid rule with the id tie-break
    val rows = dec.select("doc", "cluster", "ccos", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
    rows.groupBy(_._2).foreach { case (_, members) =>
      val expected = members.minBy(m => (m._3, m._1))
      assert(members.filter(_._4).toSeq === Seq(expected))
    }
    // corpus filter drops exactly the losers
    val losers = dec.where(!col("keep")).count()
    assert(Dedup.semDedupKeep(embs, dec).count() === embs.count() - losers)
  }

  test("DSIR: target-vocabulary docs outrank raw-vocabulary docs; resample deterministic, k-bounded") {
    import graft.tdp.Dsir
    // 30 target docs speak 'alpha', 60 raw docs speak 'beta', 10 mixed
    val docs = (0 until 100).map { i =>
      val text =
        if (i < 30) "alpha alpha alpha"
        else if (i < 90) "beta beta beta"
        else "alpha beta"
      (i.toLong, if (i < 30) "tgt" else "raw", text)
    }.toDF("doc_id", "lang", "text")
    val scored = Dsir.importance(docs, col("lang") === "tgt", buckets = 64).cache()
    val byId = scored.as[(Long, Long)].collect().toMap
    val alphaMin = (0L until 30L).map(byId).min
    val betaMax = (30L until 90L).map(byId).max
    assert(alphaMin > betaMax, "every target-vocab doc must outrank every raw-vocab doc")
    assert((90L until 100L).map(byId).forall(m => m < alphaMin && m > betaMax),
      "mixed docs rank strictly between")
    // resample: deterministic per salt, k respected, dominated by high-weight docs
    val sel1 = Dsir.resample(scored, 20, "s1").select("doc_id").as[Long].collect().toSeq
    val sel2 = Dsir.resample(scored, 20, "s1").select("doc_id").as[Long].collect().toSeq
    assert(sel1 === sel2 && sel1.size === 20)
    assert(sel1.count(_ < 30L) >= 18,
      s"importance must dominate the Gumbel noise: ${sel1.count(_ < 30L)}/20 target docs")
    // model is a bounded driver parameter: counts line up with a hand fold
    val (ct, cr) = Dsir.fitModels(docs, col("lang") === "tgt", buckets = 64)
    assert(ct.sum === 90L && cr.sum === 30 * 3 + 60 * 3 + 10 * 2)
    // plan shape: scoring is a narrow codegen'd pass over literal logits —
    // the corpus never shuffles (the model fit collected ≤ buckets rows)
    val plan = Dsir.importance(docs, col("lang") === "tgt", buckets = 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"importance scoring must not shuffle the corpus:\n$plan")
  }

  test("semantic decontamination: eval members + scaled copies flagged; LSH subset; corpus unshuffled") {
    import graft.tdp.Decontamination
    val corpus = embs
    val evalSet = Corpus.embeddings(spark, sf).where(col("vec_id") % 7 === 0)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val flagged = Decontamination.semanticContamination(corpus, evalSet, threshold = 0.98).cache()
    val evalIds = evalSet.select("vec_id").as[Long].collect().toSet
    // every eval member present in the corpus flags itself at cos 1
    evalIds.foreach { id =>
      assert(flagged.where(col("vec_id") === id && col("eval_id") === id).count() === 1, s"self $id")
    }
    // scaled plants of eval members (vec_id % 35 == 0 → both sets) flagged
    val planted = evalIds.filter(_ % 5 == 0).map(_ + 1000000L)
    planted.foreach { p =>
      assert(flagged.where(col("vec_id") === p).count() >= 1, s"plant $p not flagged")
    }
    // LSH-blocked variant can only LOSE candidates vs exact
    val lsh = Decontamination.semanticContamination(corpus, evalSet, 0.98, planes = 4)
      .select("vec_id", "eval_id").as[(Long, Long)].collect().toSet
    val exact = flagged.select("vec_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    // filter drops exactly the flagged corpus ids
    val flaggedIds = flagged.select("vec_id").as[Long].collect().toSet
    assert(Decontamination.decontaminateSemantic(corpus, flagged).count() ===
      corpus.count() - flaggedIds.size)
    // plan: eval broadcast, corpus never shuffled (no hash partitioning)
    val plan = Decontamination.semanticContamination(corpus, evalSet, 0.98)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"eval side must broadcast:\n$plan")
    assert(!plan.contains("hashpartitioning"),
      s"the corpus must stream through unshuffled:\n$plan")
  }

  test("ANN brute force: top-1 of a planted query is its scaled copy; k and ordering respected") {
    val queries = embs.where(col("vec_id") === 0L) // 0 % 5 == 0 → has a scaled copy
    val top = Similarity.bruteForceTopK(embs, queries, k = 5).cache()
    assert(top.count() === 5)
    val first = top.where(col("rk") === 1).select("nid", "cos").as[(Long, Double)].head()
    assert(first._1 === 1000000L && first._2 >= 0.9999)
    // scores non-increasing in rank
    val ordered = top.orderBy("rk").select("cos").as[Double].collect().toSeq
    assert(ordered.sliding(2).forall { case Seq(x, y) => x >= y; case _ => true })
  }

  test("ANN LSH: bucketed search still finds the scaled copy; candidates only from same bucket") {
    val queries = embs.where(col("vec_id") === 0L)
    val top = Similarity.lshTopK(embs, queries, k = 5, planes = 4)
    val first = top.where(col("rk") === 1).select("nid").as[Long].head()
    assert(first === 1000000L)
    // recall vs brute force at same k (bucket restriction may lose some)
    val bf = Similarity.bruteForceTopK(embs, queries, k = 5).select("nid").as[Long].collect().toSet
    val lsh = top.select("nid").as[Long].collect().toSet
    assert(lsh.subsetOf(bf) || lsh.intersect(bf).nonEmpty)
  }

  test("duplicate clusters: min-label propagation equals component minima; corpus dedup keeps canonicals") {
    import graft.tdp.Dedup
    // two chains + one triangle + an isolated pair: components
    // {1,2,3,4}, {10,11,12}, {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("a", "b")
    val clusters = Dedup.duplicateClusters(pairs)
    val m = clusters.as[(Long, Long)].collect().toMap
    assert(m === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    val docs = (1L to 25L).toDF("doc_id").withColumn("text", col("doc_id").cast("string"))
    val kept = Dedup.dedupByClusters(docs, clusters).select("doc_id").as[Long].collect().toSet
    // non-canonical members dropped; singletons (5..9, 13..19, 22..25) kept
    assert(kept === (1L to 25L).toSet -- Set(2L, 3L, 4L, 11L, 12L, 21L))
    // real pairs: every cluster id is the min of its members
    val real = Dedup.duplicateClusters(
      Dedup.minhashLsh(corpus, bands = 4, rowsPerBand = 4, threshold = 0.7))
    assert(real.where(col("cluster") > col("doc")).count() === 0)
    // every cluster id is itself a member of its cluster (the canonical)
    val clusterIds = real.select("cluster").distinct().as[Long].collect().toSet
    val selfLabeled = real.where(col("doc") === col("cluster")).select("doc").as[Long].collect().toSet
    assert(clusterIds === selfLabeled)
  }

  test("sampling: deterministic, stratified rates honored, splits disjoint and exhaustive") {
    import graft.tdp.Sampling
    val n = 20000L
    val ids = spark.range(n).select(col("id").as("doc_id"),
      element_at(typedlit(Seq("en", "de", "zh")), (pmod(col("id"), lit(3)) + 1).cast("int")).as("lang"))
    // determinism: two runs pick identical sets
    val s1 = Sampling.hashSample(ids, col("doc_id"), 0.3, "s").select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.hashSample(ids, col("doc_id"), 0.3, "s").select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    assert(math.abs(s1.size - n * 0.3) < n * 0.03, s"rate off: ${s1.size}")
    // stratified: per-language rates within tolerance; unlisted stratum at default
    val strat = Sampling.stratifiedSample(ids, col("lang"),
      rates = Seq("en" -> 0.9, "de" -> 0.2), defaultRate = 0.0, key = col("doc_id"))
    val byLang = strat.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") - n / 3 * 0.9) < n * 0.02)
    assert(math.abs(byLang("de") - n / 3 * 0.2) < n * 0.02)
    assert(!byLang.contains("zh"))
    // splits: exhaustive (fractions sum to 1 ⇒ ≤1 row in the 2^-32 sliver),
    // disjoint by construction, fractions honored
    val split = Sampling.assignSplits(ids, col("doc_id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val c = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(c.keySet === Set("train", "val", "test"))
    assert(c.values.sum >= n - 1)
    assert(math.abs(c("train") - n * 0.8) < n * 0.02)
    // independence across salts: overlap of two 30% samples ≈ 9%
    val other = Sampling.hashSample(ids, col("doc_id"), 0.3, "t").select("doc_id").as[Long].collect().toSet
    val overlap = s1.intersect(other).size.toDouble / n
    assert(overlap > 0.06 && overlap < 0.12, s"salted samples must be independent: $overlap")
  }

  test("minhash LSH: candidate dedup moves id pairs only — no signature crosses its exchange") {
    import org.apache.spark.sql.catalyst.plans.logical.Deduplicate
    val df = Dedup.minhashLsh(corpus, bands = 4, rowsPerBand = 4, threshold = 0.7)
    // The (a,b) dropDuplicates plans a Deduplicate whose input (= what the
    // dedup exchange carries) must be the bare id pair; the H×32-char
    // signatures are re-joined ABOVE it (round-2 VERDICT #3). The analyzed
    // plan is inspected (the returned frame is persisted, so the optimized
    // plan collapses to the InMemoryRelation); the optimizer can only
    // PRUNE an aggregate's input, never widen it, so id-only here is
    // id-only on the wire.
    val dedups = df.queryExecution.analyzed.collect { case d: Deduplicate => d }
    assert(dedups.nonEmpty, "candidate dedup node not found in the plan")
    dedups.foreach { d =>
      val carried = d.child.output.map(_.name)
      assert(carried.toSet == Set("a", "b"),
        s"candidate dedup must carry only the id pair; carried: $carried")
    }
    df.unpersist()
  }

  test("exact-dedup shuffle claims: exactGroups moves digests+ids only; exact moves the corpus once") {
    def shuffledBytes(action: => Unit): Long = {
      val bytes = new java.util.concurrent.atomic.AtomicLong
      val meter = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
      spark.sparkContext.addSparkListener(meter)
      try { action; Thread.sleep(1200) } finally spark.sparkContext.removeSparkListener(meter)
      bytes.get
    }
    // Incompressible corpus (hex of md5 chains): the sf0.001 word-soup
    // lz4-compresses to ~the digest width, hiding the row-width difference
    // the claim is about; high-entropy text shows it.
    val wide = spark.range(0, 2000).select(
      col("id").as("doc_id"),
      concat_ws("", (0 until 16).map(i =>
        md5(concat(pmod(col("id"), lit(1500)).cast("string"), lit(s"_$i")))): _*).as("text"))
      .cache()
    val docs = wide.count()
    // noop sink: a bare count() would let Catalyst PRUNE the text column
    // below the window exchange (correct, but it is exactly the full-row
    // cost this spec measures); the noop write materializes every column.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val groupsBytes = shuffledBytes(run(Dedup.exactGroups(wide)))
    val exactBytes = shuffledBytes(run(Dedup.exact(wide)))
    wide.unpersist()
    // groups: 64-hex digest + id + partial count ≈ ≤250 B/doc with
    // row/compression overhead; exact: full rows incl. 512B text (≫ that).
    assert(groupsBytes > 0 && groupsBytes < docs * 250,
      s"exactGroups shuffled $groupsBytes B for $docs docs — claim is O(docs × ~72B)")
    assert(exactBytes > groupsBytes * 3,
      s"exact ($exactBytes B) should dwarf exactGroups ($groupsBytes B) — full rows move once")
  }

  test("ANN top-k plans a PARTIAL WindowGroupLimit below the exchange (no full-scored-set shuffle)") {
    val queries = embs.where(col("vec_id") < 4L)
    val plan = Similarity.bruteForceTopK(embs, queries, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"rank filter must push a group limit:\n$plan")
    assert(plan.contains("Partial"), s"partial (pre-shuffle) top-k must be planned:\n$plan")
  }

  test("language ID: deterministic, known languages, zh short-circuit") {
    val pred = Corpus.documents(spark, sf)
      .select(TextAnalysis.langId(col("text")).as("p")).distinct().as[String].collect().toSet
    assert(pred.subsetOf(Set("en", "de", "fr", "es", "zh")))
    val zh = Seq("你好 世界").toDF("text").select(TextAnalysis.langId(col("text"))).as[String].head()
    assert(zh === "zh")
    val en = Seq("the cat and the dog of a house is in it").toDF("text")
      .select(TextAnalysis.langId(col("text"))).as[String].head()
    assert(en === "en")
  }

  test("quality score in [0,1]; degenerate docs score low") {
    val scored = Corpus.documents(spark, sf).select(TextAnalysis.qualityScore(col("text")).as("s"))
    assert(scored.where(col("s") < 0 || col("s") > 1).count() === 0)
    val junk = Seq("!!!! #### 1234 %%%%").toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).as[Double].head()
    val good = Seq("the quick brown fox jumps over the lazy dog and runs to the house of a friend in town every day").toDF("text")
      .select(TextAnalysis.qualityScore(col("text"))).as[Double].head()
    assert(good > junk)
  }

  test("token counts: ws/bpe-ish/byte-estimate consistency") {
    val t = Seq("Hello world, 42 times!").toDF("text").select(
      TextAnalysis.wsTokenCount(col("text")).as("ws"),
      TextAnalysis.bpeIshTokenCount(col("text")).as("bpe"),
      TextAnalysis.byteTokenEstimate(col("text")).as("bt"))
      .as[(Int, Int, Long)].head()
    assert(t._1 === 4)      // Hello / world, / 42 / times!
    assert(t._2 === 6)      // Hello world , 42 times !
    assert(t._3 === math.ceil(22 / 4.0).toLong)
  }

  test("fingerprints: rolling hash matches a driver-side fold; min-kgram stable under distant edits") {
    val s = "abcdef"
    val expected = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % 1000000007L)
    val got = Seq(s).toDF("text").select(TextAnalysis.rollingHash(col("text"))).as[Long].head()
    assert(got === expected)
    val base = ("x" * 40) + "unique minimal window text" + ("y" * 40)
    def md5hex(x: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expectedMin = (0 to base.length - 16).map(i => md5hex(base.substring(i, i + 16))).min
    val fp = Seq(base).toDF("text")
      .select(TextAnalysis.minKgramFingerprint(col("text"), 16)).as[String].head()
    assert(fp === expectedMin)
  }

  test("fingerprint kernels match their declarative twins on the corpus (+ unicode, short, null)") {
    val docs = Corpus.documents(spark, sf).select(col("text"))
      .unionAll(Seq("héllo wörld ünïcode ☃ text", "short", "ab", "",
        "日本語のテキストです。これは指紋のテストです。").toDF("text"))
      .unionAll(Seq(Option.empty[String]).toDF("text"))
    val mismatches = docs.select(
      TextAnalysis.rollingHash(col("text")).as("k1"),
      TextAnalysis.rollingHashDeclarative(col("text")).as("d1"),
      TextAnalysis.minKgramFingerprint(col("text"), 16).as("k2"),
      TextAnalysis.minKgramFingerprintDeclarative(col("text"), 16).as("d2"),
      TextAnalysis.winnowFingerprints(col("text"), 16, 8).as("k3"),
      TextAnalysis.winnowFingerprintsDeclarative(col("text"), 16, 8).as("d3"))
      .where(!(col("k1") <=> col("d1")) || !(col("k2") <=> col("d2")) ||
        !(col("k3") <=> col("d3")))
      .count()
    assert(mismatches === 0L)
  }

  test("winnowing guarantee: a shared run of length >= w+k-1 shares a fingerprint") {
    // Two documents with a long common substring embedded in different
    // contexts must share at least one winnow-selected fingerprint.
    val common = "the quick brown fox jumps over the lazy dog near the river bank today"
    val a = s"PREFIX AAA $common SUFFIX BBB"
    val b = s"totally different opening text here $common and a different closing"
    val fps = Seq(a, b).toDF("text")
      .select(TextAnalysis.winnowFingerprints(col("text"), 16, 8).as("fp"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(fps(0).intersect(fps(1)).nonEmpty, "documents sharing a long run must share a fingerprint")
    // and two unrelated documents (no common 16-gram) share none
    val unrelated = Seq("abcdefghijklmnopqrstuvwxyz 0123456789", "ZYXWVUTSRQPONMLKJIHGFEDCBA !@#$%^&*")
      .toDF("text")
      .select(TextAnalysis.winnowFingerprints(col("text"), 16, 8).as("fp"))
      .collect().map(_.getSeq[String](0).toSet)
    assert(unrelated(0).intersect(unrelated(1)).isEmpty)
  }

  test("IVF ANN: no self-pairs, k respected, planted scaled dups found, decent recall") {
    val emb = Corpus.embsWithDups(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val ivf = Similarity.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 2).cache()
    assert(ivf.where(col("qid") === col("nid")).count() === 0)
    assert(ivf.groupBy("qid").count().where(col("count") > 5).count() === 0)
    // the ×1.01-scaled plant has cosine 1 with its original AND the same
    // centroid ordering, so it shares the original's list — must be top-k
    val plantedQs = q.where(col("vec_id") % 5 === 0).count()
    val found = ivf.where(col("qid") % 5 === 0 &&
      col("nid") === col("qid") + 1000000L && col("cos") >= 0.9999).count()
    assert(found === plantedQs, s"found $found of $plantedQs scaled plants")
    // recall@5 vs the exact baseline with nprobe=2 of nlist=8
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val iv = ivf.select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(iv.intersect(bf).size >= bf.size * 3 / 10,
      s"recall ${iv.intersect(bf).size}/${bf.size}")
    ivf.unpersist()
  }

  test("cleaning suite: C4 line filter, PII scrub, Gopher rules behave on planted cases") {
    // C4: keeps terminal-punctuated >=3-word lines, drops the rest
    val c4 = Seq("Good sentence stays here.\nshort.\nno terminal punct line\nAnother keeper is this!")
      .toDF("text").select(Cleaning.c4LineFilter(col("text"), 3).as("c")).head.getString(0)
    assert(c4 === "Good sentence stays here.\nAnother keeper is this!")
    // PII scrub: all four tags fire, ordinary words survive
    val scrubbed = Seq("mail a.b@x.io see https://x.io/p?q=1 tok deadbeefcafebabe99 id 123456789 ok")
      .toDF("text").select(Cleaning.scrubPii(col("text")).as("s")).head.getString(0)
    assert(scrubbed === "mail [EMAIL] see [URL] tok [HEX] id [NUM] ok")
    // Gopher: a clean paragraph keeps; a bullet list and a too-short doc drop
    val docs = Seq(
      "This paragraph has plenty of ordinary readable words and it keeps flowing nicely for a while longer today.",
      "- one\n- two\n- three\n- four",
      "too short").toDF("text")
    val keeps = docs.select(Cleaning.gopherKeep(col("text"), minWords = 10).as("k"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(keeps === Seq(true, false, false))
    // per-rule flags isolate the failure cause
    val flags = docs.select(Cleaning.gopherFlags(col("text"), minWords = 10)
      .map { case (n, c) => c.as(n) }: _*).collect()
    assert(!flags(1).getAs[Boolean]("bullet_ratio_ok") || !flags(1).getAs[Boolean]("word_count_ok"))
    assert(!flags(2).getAs[Boolean]("word_count_ok"))
    // repetition: a degenerate doc scores high, clean prose near zero
    val rep = Seq(
      "spam spam spam spam spam spam spam spam spam spam",
      "every word in this sentence differs from all the others completely")
      .toDF("text").select(Cleaning.dupNgramFraction(col("text"), 3).as("f"))
      .collect().map(_.getDouble(0))
    assert(rep(0) > 0.8 && rep(1) === 0.0)
  }

  test("int8 quantization: codes in range, roundtrip error bounded by scale/2, cosine preserved") {
    import graft.tdp.Quantize
    val emb = Corpus.embeddings(spark, sf)
    val checked = emb.select(
      col("vec_id"),
      Quantize.int8Scale(col("embedding")).as("s"),
      Quantize.int8(col("embedding")).as("q"),
      Quantize.int8MaxAbsError(col("embedding")).as("err"))
    val bad = checked.where(
      exists(col("q"), c => abs(c) > 127) || col("err") > col("s") / 2 + 1e-12).count()
    assert(bad === 0L, "codes must fit int8 and the error bound must hold")
    // dequantized vectors preserve cosine structure (quantization noise small)
    val deq = checked.select(col("vec_id"),
      Quantize.dequantInt8(col("q"), col("s")).as("dv"))
    val joined = emb.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
      .join(deq, "vec_id")
      .select(Similarity.cosine(col("v"), col("dv")).as("cos"))
    assert(joined.where(col("cos") < 0.995).count() === 0L,
      "dequantized vectors must stay nearly parallel to the originals")
  }

  test("IVF with Lloyd's refinement: deterministic, planted dups still found, recall holds") {
    val emb = Corpus.embsWithDups(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    // refined centroids are deterministic (rounded means, fixed seeds)
    val c1 = Similarity.ivfCentroidsKmeans(emb, nlist = 8, iters = 2)
    val c2 = Similarity.ivfCentroidsKmeans(emb, nlist = 8, iters = 2)
    assert(c1 === c2, "k-means refinement must be deterministic")
    assert(c1.map(_._1) === Similarity.ivfCentroids(emb, 8).map(_._1), "list ids stable")

    val ivf = Similarity.ivfTopK(emb, q, k = 5, nlist = 8, nprobe = 2, kmeansIters = 2).cache()
    assert(ivf.where(col("qid") === col("nid")).count() === 0)
    assert(ivf.groupBy("qid").count().where(col("count") > 5).count() === 0)
    // the ×1.01-scaled plant has cosine 1 with its original, so it lands in
    // the same refined list — must be found
    val plantedQs = q.where(col("vec_id") % 5 === 0).count()
    val found = ivf.where(col("qid") % 5 === 0 &&
      col("nid") === col("qid") + 1000000L && col("cos") >= 0.9999).count()
    assert(found === plantedQs, s"found $found of $plantedQs scaled plants")
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val iv = ivf.select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(iv.intersect(bf).size >= bf.size * 3 / 10,
      s"recall ${iv.intersect(bf).size}/${bf.size}")
    ivf.unpersist()
  }

  test("multi-probe LSH: probe set = exact bucket + hamming-1; recall ≥ single-probe at same planes") {
    val emb = Corpus.embsWithDups(spark, sf)
    val q = emb.where(col("vec_id") < 10)
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val single = Similarity.lshTopK(emb, q, k = 5, planes = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshTopKMultiProbe(emb, q, k = 5, planes = 6)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    assert(multi.intersect(bf).size >= single.intersect(bf).size,
      s"multi ${multi.intersect(bf).size} < single ${single.intersect(bf).size}")
    // every single-probe candidate set is a subset of the probe fan-out
    assert(single.subsetOf(multi) || multi.intersect(bf).size > single.intersect(bf).size)
    // probe keys: planes+1 distinct keys, each differing by ≤1 bit
    val keys = q.limit(1).select(Similarity.multiProbeKeys(col("embedding"), 6)).as[Seq[String]].head()
    assert(keys.size === 7 && keys.distinct.size === 7)
    val exact = keys.head
    keys.tail.foreach(k => assert(k.zip(exact).count { case (a, b) => a != b } === 1))
  }

  test("FieldToEmbedding: deterministic unit-norm vectors; identical text → identical embedding") {
    import graft.operators.AiSmt
    val out = AiSmt.fieldToEmbedding(corpus.select(col("doc_id"), col("text")), "text", dims = 16).cache()
    assert(out.where(size(col("embedding")) =!= 16).count() === 0)
    val norms = out.select(
      sqrt(aggregate(col("embedding"), lit(0.0), (a, x) => a + x * x)).as("n"))
    assert(norms.where(abs(col("n") - 1.0) > 1e-9).count() === 0, "L2-normalized")
    // exact dup plants embed identically
    val e = out.where(col("doc_id") >= 2000000L)
      .select((col("doc_id") - 2000000L).as("doc_id"), col("embedding").as("e2"))
      .join(out, "doc_id")
    assert(e.where(to_json(col("embedding")) =!= to_json(col("e2"))).count() === 0)
  }

  test("model SPI: hash model == codegen column bitwise; batch-size-invariant; second model switches") {
    import graft.operators.AiSmt
    val docs = corpus.select(col("doc_id"), col("text"))
    // 1. SPI hash model must be BIT-identical to the codegen'd column
    //    twin — swapping the column path for the SPI path (q41) changes
    //    nothing observable
    val viaColumn = AiSmt.fieldToEmbedding(docs, "text", dims = 16)
      .select(col("doc_id"), to_json(col("embedding")).as("e"))
    val viaSpi = AiSmt.fieldToEmbeddingSpi(docs, "text",
      config = Map(AiSmt.ModelConfig.Dims -> "16"))
      .select(col("doc_id"), to_json(col("embedding")).as("e"))
    assert(viaColumn.join(viaSpi.withColumnRenamed("e", "e2"), "doc_id")
      .where(col("e") =!= col("e2")).count() === 0,
      "SPI hash model diverged from the codegen column")
    // 2. batched inference must be batch-size-invariant (the contract a
    //    remote/ONNX model must also satisfy): 1 vs 7 vs 1000 per batch
    val base = viaSpi.collect().map(r => (r.getLong(0), r.getString(1))).toMap
    Seq("1", "7", "1000").foreach { bs =>
      val got = AiSmt.fieldToEmbeddingSpi(docs, "text",
        config = Map(AiSmt.ModelConfig.Dims -> "16", AiSmt.ModelConfig.BatchSize -> bs))
        .select(col("doc_id"), to_json(col("embedding")).as("e"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got === base, s"batch size $bs changed the output")
    }
    // 3. the registry actually switches models: the second fake produces
    //    different (but unit-norm, deterministic) vectors
    val uni = AiSmt.fieldToEmbeddingSpi(docs, "text",
      config = Map(AiSmt.ModelConfig.Model -> "unigram", AiSmt.ModelConfig.Dims -> "16"))
    val uniRows = uni.select(col("doc_id"), to_json(col("embedding")).as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(uniRows.exists { case (k, v) => base(k) != v }, "unigram model must differ from hash")
    assert(uni.where(size(col("embedding")) =!= 16).count() === 0)
    // 4. unknown model name fails loudly at plan time, naming the model
    val exU = intercept[IllegalArgumentException] {
      AiSmt.fieldToEmbeddingSpi(docs, "text", config = Map(AiSmt.ModelConfig.Model -> "nope"))
    }
    assert(exU.getMessage.contains("'nope'"))
    // 5. NULL text parity: the column twin yields an array of null
    //    components (concat-null propagation per component); the SPI
    //    must match — not a null array, not an embedding of ""
    val withNull = docs.limit(3).unionAll(
      docs.limit(1).select(col("doc_id") + 900000000L as "doc_id", lit(null).cast("string").as("text")))
    val colNull = AiSmt.fieldToEmbedding(withNull, "text", dims = 16)
      .select(col("doc_id"), to_json(col("embedding")).as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val spiNull = AiSmt.fieldToEmbeddingSpi(withNull, "text",
      config = Map(AiSmt.ModelConfig.Dims -> "16"))
      .select(col("doc_id"), to_json(col("embedding")).as("e"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(spiNull === colNull, "SPI must match the column twin on NULL text too")
  }

  test("FieldToChunks: fixed windows reassemble to the original text, indices dense") {
    import graft.operators.AiSmt
    val docs = Corpus.documents(spark, sf).select(col("doc_id"), col("text"))
    val ch = AiSmt.fieldToChunks(docs, "text", maxLen = 50)
    val rebuilt = ch.groupBy("doc_id")
      .agg(concat_ws("", array_sort(collect_list(struct(col("chunk_idx"), col("chunk"))))
        .getField("chunk")).as("rebuilt"))
    val joined = docs.join(rebuilt, "doc_id")
    assert(joined.where(col("text") =!= col("rebuilt")).count() === 0)
    assert(ch.where(col("chunk_chars") > 50).count() === 0)
  }

  test("multimodal: typed plumbing roundtrip — decode features match payload bytes") {
    val media = Multimodal.mediaTable(spark, sf)
    val feats = Multimodal.decode(media, batchSize = 32).cache()
    assert(feats.count() === media.count())
    // features are a pure function of the payload: check one row end-to-end
    val row = media.filter(_.doc_id == 1L).head()
    val f = feats.filter(_.doc_id == 1L).head()
    assert(f.byte_len === row.payload.length.toLong)
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(row.payload).map("%02x".format(_)).mkString
    assert(f.payload_sha === sha)
    assert(f.width === (64 + f.byte_len % 576).toInt && f.height === (64 + f.byte_len % 320).toInt)
    // frame sampling: every-10th frame for videos, single frame otherwise
    val sampled = Multimodal.sampleFrames(feats.toDF(), everyN = 10)
    val v = feats.filter(_.media_type == "video").head()
    val idx = sampled.where(col("doc_id") === v.doc_id).select("frame_idx").as[Int].collect().sorted
    assert(idx.toSeq === (0 until v.frames by 10).toSeq)
    val img = feats.filter(_.media_type == "image").head()
    assert(sampled.where(col("doc_id") === img.doc_id).count() === 1)
  }
}
