package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("quotaPerGroup keeps exactly quota rows per group, deterministically") {
    val df = (1L to 100L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val kept = Curation.quotaPerGroup(df, "grp", "id", 5)
    val byGrp = kept.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp.values.forall(_ == 5) && byGrp.size == 3)
    // deterministic: same selection on re-run
    val ids1 = kept.select("id").as[Long].collect().sorted.toSeq
    val ids2 = Curation.quotaPerGroup(df, "grp", "id", 5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2)
    // groups smaller than the quota keep everything
    val small = Curation.quotaPerGroup(df.filter($"id" <= 4), "grp", "id", 5)
    assert(small.count() == 4)
  }

  test("removeBoilerplateSegments drops shared segments, keeps order") {
    // segTokens=2: docs 1 and 2 share segment "nav bar"; doc 3 is clean
    val df = Seq(
      (1L, "nav bar unique one tail x"),
      (2L, "nav bar other two"),
      (3L, "fully distinct words here"))
      .toDF("doc_id", "text")
    val out = Curation.removeBoilerplateSegments(df, "doc_id", "text", 2, 1L)
      .select("doc_id", "n_segs", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1L, "unique one tail x")))
    assert(out(2L) == ((2L, 2L, 1L, "other two")))
    assert(out(3L) == ((3L, 2L, 0L, "fully distinct words here")))
  }

  test("removeBoilerplateSegments: fully-boilerplate doc yields empty text") {
    val df = Seq((1L, "same text"), (2L, "same text")).toDF("doc_id", "text")
    val out = Curation.removeBoilerplateSegments(df, "doc_id", "text", 2, 1L)
      .select("doc_id", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect().toSet
    assert(out == Set((1L, 1L, ""), (2L, 1L, "")))
  }

  test("contaminatedDocs flags exactly the docs sharing an n-gram") {
    val train = Seq(
      (10L, "a b c d e f"),   // shares 4-gram "b c d e" with bench
      (11L, "x y z w q r"))   // clean
      .toDF("doc_id", "text")
    val bench = Seq((1L, "q b c d e k")).toDF("doc_id", "text")
    val flagged = Curation.contaminatedDocs(train, bench, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    assert(flagged == Map(10L -> 1L))
  }

  test("contaminatedDocsBloom equals the exact path (false positives rejected)") {
    // a larger fixture so the Bloom actually cuts: 30 clean train docs,
    // 2 contaminated (one sharing with each bench doc)
    val bench = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    val train = ((0 until 30).map(i =>
        (100L + i, s"clean$i filler$i words$i more$i stuff$i pad$i")) ++ Seq(
        (200L, "xx alpha beta gamma delta yy"),
        (201L, "zz one two three four qq")))
      .toDF("doc_id", "text")
    val exact = Curation.contaminatedDocs(train, bench, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    val bloom = Curation.contaminatedDocsBloom(train, bench, "doc_id", "text", 4)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact, s"bloom=$bloom exact=$exact")
    assert(exact.keySet == Set(200L, 201L))
  }

  test("budgetSelect: bucket fill, fractional scores bucket down, null scores excluded") {
    val docs = Seq(
      (1L, 9.5, 100L), (2L, 9.1, 100L),  // bucket 9 (fractional scores)
      (3L, 5.0, 100L), (4L, 5.0, 100L),  // bucket 5
      (5L, 1.0, 100L)                    // bucket 1
    ).toDF("doc_id", "score", "toks")
    // budget covers bucket 9 fully; bucket 5 at half rate; bucket 1 none
    val kept = Curation.budgetSelect(docs, "score", "toks", "doc_id", 300L)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L).subsetOf(kept), s"best bucket must keep fully: $kept")
    assert(!kept.contains(5L), s"worst bucket past budget must drop: $kept")
    // a null score neither crashes nor consumes budget
    val withNull = Seq(
      (1L, java.lang.Double.valueOf(9.0), 100L),
      (2L, null.asInstanceOf[java.lang.Double], 100L))
      .toDF("doc_id", "score", "toks")
    val keptN = Curation.budgetSelect(withNull, "score", "toks", "doc_id", 100L)
      .select("doc_id").as[Long].collect().toSet
    assert(keptN == Set(1L), s"null-score rows must be excluded: $keptN")
    // degenerate budgets
    assert(Curation.budgetSelect(docs, "score", "toks", "doc_id", 0L).count() == 0)
    assert(Curation.budgetSelectFraction(docs, "score", "toks", "doc_id", 1L, 1L)
      .count() == 5, "full fraction keeps everything")
    // a bucket whose EVERY token count is null sums to NULL — it must
    // carry zero token mass, not NPE the driver walk (ADVICE r8 #2)
    val nullToks = Seq(
      (1L, 9.0, java.lang.Long.valueOf(100L)),
      (2L, 5.0, null.asInstanceOf[java.lang.Long]),
      (3L, 5.0, null.asInstanceOf[java.lang.Long]),
      (4L, 1.0, java.lang.Long.valueOf(100L)))
      .toDF("doc_id", "score", "toks")
    val keptT = Curation.budgetSelect(nullToks, "score", "toks", "doc_id", 101L)
      .select("doc_id").as[Long].collect().toSet
    // bucket 9 (100 toks) fits; bucket 5 carries zero mass and is kept
    // free; bucket 1 gets bp = 100 and hash60("4") % 10⁴ = 9729 ≥ 100
    assert(keptT == Set(1L, 2L, 3L), s"null-token bucket is free to keep: $keptT")
  }

  test("budgetSelect exact path refuses continuous scores, pointing at the bucketed path") {
    // 50 distinct long-cast scores against a bound of 8: the guard must
    // throw (the collect is limit-bounded, so the oversized result never
    // reaches the driver) and the message must route to the fix
    val docs = (1 to 50).map(i => (i.toLong, i * 1000.0, 10L)).toDF("doc_id", "score", "toks")
    val e = intercept[IllegalArgumentException] {
      Curation.budgetSelect(docs, "score", "toks", "doc_id", 100L, maxScoreBuckets = 8)
    }
    assert(e.getMessage.contains("budgetSelectBucketed"), e.getMessage)
    // at or under the bound the path works unchanged
    assert(Curation.budgetSelect(docs, "score", "toks", "doc_id", 100L,
      maxScoreBuckets = 50).count() > 0)
  }

  test("budgetSelectBucketed: equals exact path on bucket-aligned scores; O(B) collect") {
    // 100 rows, 10 integer scores x 10 rows each, uniform tokens: with
    // buckets == #score-groups the ntile(score DESC, id) bucketization
    // coincides with score groups, so the bucketed walk + threshold hash
    // gate must reproduce the exact path's kept set row for row
    val docs = (1L to 100L).map(i => (i, ((i - 1) / 10).toDouble, 10L))
      .toDF("doc_id", "score", "toks")
    for (budget <- Seq(0L, 250L, 305L, 1000L)) {
      val exact = Curation.budgetSelect(docs, "score", "toks", "doc_id", budget)
        .select("doc_id").as[Long].collect().toSet
      val bucketed = Curation.budgetSelectBucketed(
          docs, "score", "toks", "doc_id", budget, buckets = 10)
        .select("doc_id").as[Long].collect().toSet
      assert(bucketed === exact, s"budget=$budget")
    }
    // fraction variant parity with the budget variant
    val viaFraction = Curation.budgetSelectBucketedFraction(
        docs, "score", "toks", "doc_id", 1L, 4L, buckets = 10)
      .select("doc_id").as[Long].collect().toSet
    val viaBudget = Curation.budgetSelectBucketed(
        docs, "score", "toks", "doc_id", 250L, buckets = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(viaFraction === viaBudget)

    // CONTINUOUS scores: 5000 distinct real values, B=16 — the driver
    // collect is the bucket-totals aggregation and must stay O(B), which
    // is the whole point of this variant (the exact path would walk 5000)
    val continuous = (1L to 5000L)
      .map(i => (i, math.log1p(i.toDouble) * 0.7071, 3L))
      .toDF("doc_id", "score", "toks")
    val bucketedDf = graft.operators.Histogram.ntileExact(
      continuous, Seq(col("score").desc, col("doc_id")), 16)
    val totals = Curation.bucketTokenTotals(bucketedDf, "toks")
    assert(totals.size <= 16, s"collect must be O(buckets): ${totals.size}")
    assert(totals.map(_._2).sum === 15000L)
    // selection behaves: keeps ~budget tokens, preferring high buckets
    val kept = Curation.budgetSelectBucketed(
      continuous, "score", "toks", "doc_id", 6000L, buckets = 16)
    val keptTok = kept.agg(sum("toks")).as[Long].head()
    assert(keptTok >= 4500L && keptTok <= 7500L,
      s"kept tokens should approximate the budget: $keptTok")
    // best-bucket rows (highest scores = highest ids here) survive fully:
    // 6000/15000 budget => the top ~1875 ranks are whole-kept
    assert(kept.filter($"doc_id" > 4000L).count() === 1000L,
      "whole better buckets must be kept, not sampled")

    // fillRates walk arithmetic pinned directly (pure function)
    assert(Curation.fillRates(Seq((1L, 100L), (2L, 100L), (3L, 100L)), 150L)
      === Seq((1L, 10000L), (2L, 5000L), (3L, 0L)))
    assert(Curation.fillRates(Seq((1L, 100L)), 0L) === Seq((1L, 0L)))
    assert(Curation.fillRates(Nil, 10L) === Nil)
    // zero-mass bucket while budget remains: free to keep (bp 10000)
    assert(Curation.fillRates(Seq((1L, 100L), (2L, 0L), (3L, 50L)), 120L)
      === Seq((1L, 10000L), (2L, 10000L), (3L, 4000L)))
  }

  test("curation operators are empty-input safe") {
    val empty = Seq.empty[(Long, String)].toDF("id", "grp")
    assert(Curation.quotaPerGroup(empty, "grp", "id", 5).count() == 0)
    assert(Curation.mixtureResample(empty, "grp", "id").count() == 0)
    assert(Curation.deterministicShuffle(empty, "id").count() == 0)
    val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.removeBoilerplateSegments(emptyDocs, "doc_id", "text", 8, 1L).count() == 0)
    assert(Curation.contaminatedDocs(emptyDocs, emptyDocs, "doc_id", "text", 8).count() == 0)
  }

  test("mixtureResample thins over-represented groups toward uniform share") {
    // 300 "en", 30 "de", 30 "fr": N=360, target=120/group → en keeps at
    // 10000*360/(3*300) = 4000 bps ≈ 40%, de/fr keep 100%
    val df = ((1L to 300L).map(i => (i, "en")) ++
      (301L to 330L).map(i => (i, "de")) ++
      (331L to 360L).map(i => (i, "fr"))).toDF("id", "lang")
    val kept = Curation.mixtureResample(df, "lang", "id")
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("de") == 30 && byLang("fr") == 30, "under-target groups keep all")
    // hash sample at 40%: expect ~120, allow generous noise band
    assert(byLang("en") > 80 && byLang("en") < 160, s"en kept ${byLang("en")}")
    // deterministic: identical selection across runs
    val again = Curation.mixtureResample(df, "lang", "id")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("id").as[Long].collect().sorted.toSeq)
    // no shuffle of the input: the rates join must be a broadcast
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast:\n$plan")
  }

  test("temperatureResample boosts low-resource shares without upsampling") {
    // 400 "en", 100 "de", 25 "fr": α=0.5 weights 20/10/5 → shares
    // 4/7, 2/7, 1/7. T = min(n_i/p_i) = min(700, 350, 175) = 175 →
    // rates: en 175·(4/7)/400 = 25%, de 175·(2/7)/100 = 50%, fr 100%
    val df = ((1L to 400L).map(i => (i, "en")) ++
      (401L to 500L).map(i => (i, "de")) ++
      (501L to 525L).map(i => (i, "fr"))).toDF("id", "lang")
    val kept = Curation.temperatureResample(df, "lang", "id", alpha = 0.5)
    val byLang = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("fr") == 25, "the scarcest group is never thinned")
    assert(byLang("en") > 60 && byLang("en") < 140, s"en ~25%: ${byLang("en")}")
    assert(byLang("de") > 30 && byLang("de") < 70, s"de ~50%: ${byLang("de")}")
    // α=1 reproduces the input mix: every rate is 1
    assert(Curation.temperatureResample(df, "lang", "id", alpha = 1.0)
      .count() == 525)
    // deterministic across runs
    val again = Curation.temperatureResample(df, "lang", "id", alpha = 0.5)
      .select("id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("id").as[Long].collect().sorted.toSeq)
    // empty and all-null-group inputs return empty, never throw (the
    // q154 composition can legitimately drain the corpus)
    val empty = Seq.empty[(Long, String)].toDF("id", "lang")
    assert(Curation.temperatureResample(empty, "lang", "id").count() == 0)
    val nulls = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "lang")
    assert(Curation.temperatureResample(nulls, "lang", "id").count() == 0)
  }

  test("mixtureResample excludes null groups from output AND rate denominators") {
    val df = ((1L to 100L).map(i => (i, Option("en"))) ++
      (101L to 200L).map(i => (i, Option.empty[String]))).toDF("id", "grp")
    val kept = Curation.mixtureResample(df, "grp", "id")
    // with the null group excluded, "en" is the ONLY group (rate 100%);
    // counting nulls in the denominator would have halved its rate
    assert(kept.count() == 100)
    assert(kept.filter(col("grp").isNull).count() == 0)
  }

  test("keepBps is exact at row counts where Long bps math overflows") {
    // total ~9.2e14 made total*10000 overflow Long (round-3 ADVICE); the
    // BigInt path must keep exact integer semantics at any Long total
    val total = 922_337_203_685_477L * 1000 // 9.22e17 rows
    // a group holding half the rows in a 2-group mixture keeps everything
    assert(Curation.keepBps(total, 2, total / 2) == 10000L)
    // a group holding 90% of a 2-group mixture keeps 5000/9000 bps = 5555
    assert(Curation.keepBps(total, 2, total / 10 * 9) == 5555L)
    // tiny groups cap at 10000, never a corrupted negative rate
    assert(Curation.keepBps(total, 2, 1) == 10000L)
    // and the small-scale value matches plain Long arithmetic
    assert(Curation.keepBps(1000, 4, 500) == (1000L * 10000) / (4 * 500))
  }

  test("tokenKlDivergence matches a local computation and is lazy + empty-safe") {
    val df = Seq(
      ("a", "x x y"), ("a", "y z"),         // group a: x:2 y:2 z:1
      ("b", "z z z x"))                     // group b: z:3 x:1
      .toDF("grp", "body")
    val got = Curation.tokenKlDivergence(df, "grp", "body")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    // local ground truth
    val ga = Map("x" -> 2L, "y" -> 2L, "z" -> 1L)
    val gb = Map("z" -> 3L, "x" -> 1L)
    val corpus = (ga.keySet ++ gb.keySet).map(t =>
      t -> (ga.getOrElse(t, 0L) + gb.getOrElse(t, 0L))).toMap
    val n = corpus.values.sum.toDouble
    def kl(g: Map[String, Long]): Double = {
      val ng = g.values.sum.toDouble
      g.map { case (t, k) =>
        (k / ng) * math.log((k / ng) / (corpus(t) / n))
      }.sum
    }
    assert(got("a")._2 == 5L && got("b")._2 == 4L)
    assert(math.abs(got("a")._3 - math.rint(kl(ga) * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got("b")._3 - math.rint(kl(gb) * 1e6) / 1e6) < 1e-9)
    // a single group diverges nowhere: KL == 0 exactly
    val single = Curation.tokenKlDivergence(
      Seq(("only", "p q r p")).toDF("grp", "body"), "grp", "body")
      .as[(String, Long, Double)].collect()
    assert(single.toSeq == Seq(("only", 4L, 0.0)))
    // empty input: empty result (the eager scalar used to NPE here),
    // and building the plan triggers no Spark job
    val empty = Seq.empty[(String, String)].toDF("grp", "body")
    assert(Curation.tokenKlDivergence(empty, "grp", "body").count() == 0)
  }

  test("deterministicShuffle: a permutation, stable across runs and partitionings") {
    val df = (1L to 500L).toDF("id")
    val a = Curation.deterministicShuffle(df, "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a.values.toSeq.sorted == (0L until 500L))
    val b = Curation.deterministicShuffle(df.repartition(7), "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a == b, "shuffle order must not depend on input partitioning")
    // a different salt produces a different permutation
    val c = Curation.deterministicShuffle(df, "id", salt = "other")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(c != a)
  }

  test("leakageSafeSplit: cluster-coherent, transitive, singleton-safe, deterministic") {
    // chain A≈B≈C: leakage must close transitively — a pairwise rule
    // would allow A and C in different splits
    val items = (1L to 200L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 60L))
      .toDF("id1", "id2")
    val got = Curation.leakageSafeSplit(items, pairs, "id")
      .select("id", "cluster", "split")
      .as[(Long, Long, String)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.size === 200)
    // every pair (and the transitive chain) shares cluster AND split
    for ((a, b) <- Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L), (50L, 60L))) {
      assert(byId(a)._2 === byId(b)._2, s"$a/$b cluster")
      assert(byId(a)._3 === byId(b)._3, s"$a/$b split")
    }
    // singletons are their own cluster
    assert(byId(100L)._2 === 100L)
    // all three splits realized on 200 ids and fractions are sane
    val frac = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(frac.keySet === Set("train", "val", "test"), frac.toString)
    assert(frac("train") > frac("val") && frac("train") > frac("test"), frac.toString)
    // deterministic: a second run assigns identically
    val again = Curation.leakageSafeSplit(items, pairs, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(got.forall { case (id, _, s) => again(id) == s })
  }

  test("leakageSafeSplit refuses malformed cuts") {
    val items = Seq(1L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    val e1 = intercept[IllegalArgumentException](Curation.leakageSafeSplit(
      items, pairs, "id", Seq("train" -> 90, "val" -> 5)))
    assert(e1.getMessage.contains("summing to 100"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](Curation.leakageSafeSplit(
      items, pairs, "id", Seq("train" -> 50, "train" -> 50)))
    assert(e2.getMessage.contains("distinct names"), e2.getMessage)
  }

  test("duplicateSpans catches MISALIGNED shared passages; counts are exact") {
    // docs 1 and 2 share "p q r" but at different token offsets (1 vs 2) —
    // q104-style disjoint segments would never align them; doc 3 repeats
    // the span twice internally but is a single doc (below minDocs=2 on
    // its own, still adds occurrences to the shared span's count)
    val docs = Seq(
      (1L, "p q r tail1 tail2"),
      (2L, "lead p q r tail3"),
      (3L, "p q r p q r"),
      (4L, "u v w x y")).toDF("doc_id", "text")
    val got = Curation.duplicateSpans(docs, "doc_id", "text",
        spanTokens = 3, minDocs = 2, topK = 10)
      .as[(String, Long, Long)].collect()
    val pqr = java.security.MessageDigest.getInstance("MD5")
      .digest("p q r".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byMd5 = got.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byMd5.contains(pqr), "the shared 3-token span must be reported")
    // docs 1, 2, 3 contain it; occurrences: 1 + 1 + 2 = 4
    assert(byMd5(pqr) == ((3L, 4L)))
    // every reported span really spans >= 2 docs
    assert(got.forall(_._2 >= 2))
    // doc-4 text shares nothing: its spans are absent
    assert(!got.exists(_._2 > 4))
  }

  test("duplicateSpans: no span shorter than spanTokens; empty-input safe") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    // both docs are 2 tokens; spanTokens=3 -> no windows at all
    assert(Curation.duplicateSpans(docs, "doc_id", "text", 3).count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.duplicateSpans(empty, "doc_id", "text", 2).count() == 0)
  }

  test("weightedSampleTopK: deterministic ES keys, weight mass respected") {
    val rows = (1L to 200L).map(i => (i, i % 5 match {
      case 0 => null.asInstanceOf[java.lang.Long] // no mass: excluded
      case 1 => Long.box(0L)                      // nonpositive: excluded
      case _ => Long.box(i)
    })).toDF("id", "w")
    val got = Curation.weightedSampleTopK(rows, "id", "w", k = 20)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.size == 20)
    assert(got.forall(_._2 > 0), "zero/null-weight rows must never be sampled")
    // exact ES key replay: ln(u)/w with u=(hash60+1)/(2^60+1), rounded 9dp
    val hashes = rows.filter("w IS NOT NULL AND w > 0")
      .selectExpr("id", "conv(substring(md5(cast(id AS string)), 1, 15), 16, 10)")
      .as[(Long, String)].collect().toMap
    val expect = hashes.map { case (id, h) =>
      val u = (h.toLong + 1).toDouble / ((1L << 60) + 1).toDouble
      id -> BigDecimal(math.log(u) / id.toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val topIds = expect.toSeq.sortBy { case (id, k) => (-k, id) }.take(20)
    assert(got.map(r => r._1 -> r._3).toSeq == topIds.map { case (id, k) => id -> k })
    // reproducible across partitionings (pure function of the key)
    val again = Curation.weightedSampleTopK(rows.repartition(7), "id", "w", 20)
      .as[(Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("weightedSamplePerGroup: k per group, same keys as the global sample") {
    val rows = (1L to 90L).map(i => (s"g${i % 3}", i, i + 10))
      .toDF("grp", "id", "w")
    val got = Curation.weightedSamplePerGroup(rows, "grp", "id", "w", k = 5)
      .as[(String, Long, Long, Double)].collect()
    val byGrp = got.groupBy(_._1)
    assert(byGrp.keySet == Set("g0", "g1", "g2") &&
      byGrp.values.forall(_.length == 5))
    // the per-group winners are exactly the group-restricted global ES
    // ranking — same hash keys, so cross-check against weightedSampleTopK
    val g1Global = Curation.weightedSampleTopK(
        rows.filter($"grp" === "g1").select("id", "w"), "id", "w", 5)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._3)).toSeq
    val g1Strat = got.filter(_._1 == "g1")
      .sortBy(r => (-r._4, r._2)).map(r => (r._2, r._4)).toSeq
    assert(g1Strat == g1Global)
    // groups smaller than k keep everything with positive weight
    val tiny = Seq(("a", 1L, 5L), ("a", 2L, 0L), ("b", 3L, 2L))
      .toDF("grp", "id", "w")
    val t = Curation.weightedSamplePerGroup(tiny, "grp", "id", "w", 5)
      .as[(String, Long, Long, Double)].collect()
    assert(t.map(r => (r._1, r._2)).toSet == Set(("a", 1L), ("b", 3L)))
  }

  test("dsirSelect ranks target-like pool docs first and excludes the target") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "wiki facts wiki facts", "tgt"),   // target distribution
      (1L, "wiki facts more", "pool"),        // shares target vocabulary
      (2L, "spam spam buy now", "pool"),
      (3L, "facts wiki", "pool")).toDF("doc_id", "text", "source")
    val got = Curation.dsirSelect(docs, "doc_id", "text",
        targetPred = col("source") === "tgt", topK = 10)
      .as[(Long, Long, Double, Long)].collect().toSeq
    // target doc 0 never appears; target-vocab docs outrank the spam doc
    assert(got.map(_._2).toSet == Set(1L, 2L, 3L))
    val weightOf = got.map(r => r._2 -> r._3).toMap
    assert(weightOf(1L) > weightOf(2L) && weightOf(3L) > weightOf(2L))
    // ranks follow (weight desc, doc_id) exactly
    assert(got.sortBy(_._1).map(_._2) ==
      got.sortBy(r => (-r._3, r._2)).map(_._2))
    // n_ngrams = unigrams + bigrams: "facts wiki" → 2 + 1
    assert(got.find(_._2 == 3L).get._4 == 3L)
  }

  test("dsirSelect is deterministic across reruns and respects topK") {
    import org.apache.spark.sql.functions.col
    val docs = (0L to 30L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3}",
        if (i % 10 == 0) "t" else "p")).toDF("doc_id", "text", "source")
    def run() = Curation.dsirSelect(docs, "doc_id", "text",
        col("source") === "t", topK = 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    val a = run()
    assert(a == run() && a.size == 5 && a.map(_._1) == (1L to 5L))
  }
}
