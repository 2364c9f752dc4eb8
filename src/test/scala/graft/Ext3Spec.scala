package graft

import org.apache.spark.sql.functions._

import graft.ext.{Featurize, Graph, Retrieval}

/** Semantics specs for the ExtQueries3 operators — hand-computed link
  * prediction on a 4-node fixture, QL-Dirichlet ranking/OOV behavior,
  * pinned target-encoding shrinkage, feature-hash shape invariants, and
  * an independent recomputation of the CUPED θ/ρ² algebra.
  */
class Ext3Spec extends SparkSpec {
  import spark.implicits._

  test("linkPrediction: hand-computed AA/Jaccard, edges excluded, cap") {
    // edges: 1-2, 2-3, 1-3, 1-4, 3-4.  deg: 1→3, 2→2, 3→3, 4→2.
    // Only non-adjacent pair with ≥2 common neighbors is (2,4), via
    // z ∈ {1, 3}: aa = 2·round(1/ln 3, 6) = 1.820478,
    // jaccard = 2 / (2 + 2 − 2) = 1.0.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val out = Graph.linkPrediction(edges, maxDeg = 50, minCommon = 2)
      .collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("u") == 2L && r.getAs[Long]("v") == 4L)
    assert(r.getAs[Long]("common_neighbors") == 2L)
    assert(math.abs(r.getAs[Double]("aa_score") - 1.820478) < 1e-9)
    assert(math.abs(r.getAs[Double]("jaccard") - 1.0) < 1e-9)
    // cap at 2 excludes both degree-3 centers → no wedges survive
    val capped = Graph.linkPrediction(edges, maxDeg = 2, minCommon = 2)
      .collect()
    graft.ops.CacheScope.releaseAll()
    assert(capped.isEmpty)
  }

  test("qlDirichletTopK: term density ranks, OOV terms are inert") {
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "banana banana banana cherry"),
      (3L, "cherry date")).toDF("doc_id", "text")
    val ranked = Retrieval.qlDirichletTopK(
      docs, "text", "doc_id", Seq("banana"), k = 3, mu = 10.0)
      .orderBy(col("rank")).collect()
    graft.ops.CacheScope.releaseAll()
    // doc 2 has the highest banana mass, doc 3 none (pure length penalty)
    assert(ranked.map(_.getAs[Long]("doc_id")).toSeq == Seq(2L, 1L, 3L))
    assert(ranked.head.getAs[Double]("score") >
      ranked.last.getAs[Double]("score"))
    // an out-of-corpus query term is dropped (qn counts survivors), so
    // scores are identical with and without it
    val withOov = Retrieval.qlDirichletTopK(
      docs, "text", "doc_id", Seq("banana", "zzz"), k = 3, mu = 10.0)
      .orderBy(col("rank")).collect()
    graft.ops.CacheScope.releaseAll()
    assert(withOov.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).toSeq ==
      ranked.map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Double]("score"))).toSeq)
  }

  test("targetEncode: pinned shrinkage toward the global mean") {
    // a: 4 rows all 1 (raw 1.0), b: 1 row 0 (raw 0.0); global = 0.8
    // m=1 → enc(a) = (4 + 0.8)/5 = 0.96, enc(b) = (0 + 0.8)/2 = 0.4
    val rows = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 1), ("b", 0))
      .toDF("c", "t")
    val out = Featurize.targetEncode(rows, "c", "t", m = 1.0)
      .collect().map(r => r.getAs[String]("category") ->
        (r.getAs[Double]("raw_rate"), r.getAs[Double]("encoded"))).toMap
    graft.ops.CacheScope.releaseAll()
    assert(out("a") == ((1.0, 0.96)))
    assert(out("b") == ((0.0, 0.4)))
  }

  test("featureHash: sparse shape, bucket range, signed counts") {
    val docs = Seq((1L, "x"), (2L, "x x y")).toDF("doc_id", "text")
    val out = Featurize.featureHash(docs, "text", "doc_id", dims = 64)
      .collect()
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    // single-token doc: exactly one bucket at ±1
    assert(d1.length == 1 && math.abs(d1.head.getAs[Long]("val")) == 1L)
    assert(out.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 64
    })
    // the same token hashes to the same bucket in every doc; doc 2's
    // x bucket carries twice doc 1's x value (same sign, tf 2)
    val xb = d1.head.getAs[Long]("bucket")
    val d2x = d2.filter(_.getAs[Long]("bucket") == xb)
    assert(d2x.length == 1 &&
      d2x.head.getAs[Long]("val") == 2L * d1.head.getAs[Long]("val"))
  }

  test("knBigramScore: hand-computed Kneser–Ney probabilities") {
    // corpus: "a b", "a b", "a c" → bigram types {(a b):2, (a c):1}
    // c(a·)=3, N1+(a·)=2, N1+(·b)=1, N1+(·c)=1, T=2, D=0.75
    // P(b|a) = (2−D)/3 + (D·2/3)·(1/2) = 1.25/3 + 0.25
    // P(c|a) = (1−D)/3 + (D·2/3)·(1/2) = 0.25/3 + 0.25
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val out = graft.ext.TextStats.knBigramScore(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_kn_logprob")).toMap
    graft.ops.CacheScope.releaseAll()
    val pBA = (2 - 0.75) / 3.0 + (0.75 * 2 / 3.0) * (1 / 2.0)
    val pCA = (1 - 0.75) / 3.0 + (0.75 * 2 / 3.0) * (1 / 2.0)
    assert(math.abs(out(1L) - math.log(pBA)) < 1e-5)
    assert(math.abs(out(2L) - math.log(pBA)) < 1e-5)
    assert(math.abs(out(3L) - math.log(pCA)) < 1e-5)
    // the frequent bigram is more probable — KN's whole point survives
    assert(out(1L) > out(3L))
  }

  test("ngramNovelty: first owner wins, repeats score 0.5, short docs " +
      "have no opinion") {
    val docs = Seq(
      (1L, "a b c d"),   // trigrams {abc, bcd} — both first here
      (2L, "a b c e"),   // {abc (seen), bce (new)} → 0.5
      (3L, "x")).toDF("doc_id", "text")
    val out = graft.ext.TextDedup.ngramNovelty(docs, "text", "doc_id", 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_novel"),
          Option(r.getAs[java.lang.Double]("novelty")))).toMap
    graft.ops.CacheScope.releaseAll()
    assert(out(1L) == ((2L, 2L, Some(1.0))))
    assert(out(2L) == ((2L, 1L, Some(0.5))))
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("sharedFramePairs: re-cut alignment found, hot frames pruned") {
    import graft.ext.Multimodal
    // grid: chunkLen 4, stride 8 → frames at offsets 0/8/16/24
    val full = "aaaabbbbccccddddeeeeffffgggghhhh" // frames aaaa cccc eeee gggg
    val cut = full.substring(8) // frames cccc eeee gggg — 3 shared
    // 60 payloads all opening with the same boilerplate frame but
    // otherwise unique: that digest's df = 60 > 50 → pruned, no pairs
    val boiler = (100L until 160L).map(i => (i, s"ssss____u$i%04d____"))
    val docs = (Seq((1L, full), (2L, cut), (3L, "zzzz0000zzzz1111zzzz"))
      ++ boiler).toDF("id", "t")
      .select(col("id"), Multimodal.asPayload(col("t")).as("payload"))
    val out = Multimodal.sharedFramePairs(docs, "id", "payload",
      chunkLen = 4, stride = 8, maxChunks = 4,
      minShared = 1, maxDocsPerFrame = 50).collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("id_a") == 1L && r.getAs[Long]("id_b") == 2L)
    assert(r.getAs[Long]("n_shared") == 3L)
    // frac over the SMALLER frame set: 3 / min(4, 3) = 1.0
    assert(r.getAs[Double]("frac") == 1.0)
  }

  test("bootstrapMeanCi: constant column degenerates, weights resample") {
    val docs = (1L to 200L).map(i => (i, 7L)).toDF("id", "v")
    val out = graft.ext.Stats.bootstrapMeanCi(docs, "id", "v", reps = 8)
      .collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.length == 8)
    // a constant metric bootstraps to itself: every replica mean and
    // both CI bounds are exactly the constant
    assert(out.forall(r => r.getAs[Double]("mean") == 7.0 &&
      r.getAs[Double]("ci_lo") == 7.0 && r.getAs[Double]("ci_hi") == 7.0))
    // Poisson(1) weights: effective n stays near n, and the replicas
    // are genuinely different resamples (not all the same draw)
    val effs = out.map(_.getAs[Long]("n_eff"))
    assert(effs.forall(e => e > 140 && e < 260))
    assert(effs.distinct.length > 1)
  }

  test("ksTest: hand-computed D on shifted samples, zero on identical") {
    // A = {1,2,3,4}, B = {3,4,5,6}: max CDF gap = 0.5 (at v = 2..4)
    val rows = (Seq(1, 2, 3, 4).map(v => (v.toLong, "a"))
      ++ Seq(3, 4, 5, 6).map(v => (v.toLong, "b"))).toDF("v", "g")
    val out = graft.ext.Stats.ksTest(rows, "v", "g", "a", "b")
      .collect().head
    graft.ops.CacheScope.releaseAll()
    assert(out.getAs[Long]("n_a") == 4L && out.getAs[Long]("n_b") == 4L)
    assert(out.getAs[Double]("d_stat") == 0.5)
    assert(math.abs(out.getAs[Double]("ks_stat")
      - math.sqrt(2.0) * 0.5) < 1e-6)
    // identical samples → D = 0
    val same = (Seq(1, 2, 3).map(v => (v.toLong, "a"))
      ++ Seq(1, 2, 3).map(v => (v.toLong, "b"))).toDF("v", "g")
    val z = graft.ext.Stats.ksTest(same, "v", "g", "a", "b")
      .collect().head
    graft.ops.CacheScope.releaseAll()
    assert(z.getAs[Double]("d_stat") == 0.0)
  }

  test("mutualInformation: zero for independence, H for identity") {
    // 2×2 uniform — exactly independent, every cell ln term is ln(1)=0
    val indep = Seq(("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"))
      .toDF("a", "b")
    val mi0 = graft.ext.Stats.mutualInformation(indep, "a", "b")
      .collect().head
    graft.ops.CacheScope.releaseAll()
    assert(mi0.getAs[Double]("mi") == 0.0)
    // identity mapping: MI = H(a) = H(b) = ln 2, NMI = 1
    val dep = Seq(("x", "x"), ("y", "y"), ("x", "x"), ("y", "y"))
      .toDF("a", "b")
    val mi1 = graft.ext.Stats.mutualInformation(dep, "a", "b")
      .collect().head
    graft.ops.CacheScope.releaseAll()
    assert(math.abs(mi1.getAs[Double]("mi") - math.log(2)) < 1e-5)
    assert(math.abs(mi1.getAs[Double]("nmi") - 1.0) < 1e-5)
  }

  test("q_chi2_priority_status: matches a from-first-principles replay") {
    val sf = "/root/testdata/sf0.001"
    val out = AnalyticsQueries.qChi2.run(spark, sf).collect().head
    val cells = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("obs"))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("obs")))
    val n = cells.map(_._3).sum.toDouble
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chi2 = cells.map { case (p, s, obs) =>
      val e = rt(p) * ct(s) / n; (obs - e) * (obs - e) / e
    }.sum
    assert(math.abs(out.getAs[Double]("chi2") - chi2) < 1e-4)
    assert(out.getAs[Long]("dof") ==
      (rt.size - 1).toLong * (ct.size - 1))
    val v = math.sqrt(out.getAs[Double]("chi2") /
      (n * (math.min(rt.size, ct.size) - 1)))
    assert(math.abs(out.getAs[Double]("cramers_v") - v) < 1e-5)
  }

  test("q_cuped_adjusted: θ and ρ² match an independent covariance " +
      "recomputation") {
    val sf = "/root/testdata/sf0.001"
    val out = AnalyticsQueries.qCuped.run(spark, sf).collect().head
    // rebuild the per-customer (x, y) frame and let Spark's own
    // covar_pop/var_pop/corr check the fused-sums algebra
    val pre = to_date(col("o_orderdate")) < lit("1996-01-01").cast("date")
    val per = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(Det.dsum(when(pre, col("o_totalprice")).otherwise(lit(0.0)))
          .as("x"),
        Det.dsum(when(!pre, col("o_totalprice")).otherwise(lit(0.0)))
          .as("y"))
    val chk = per.agg(
      (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("theta"),
      (corr(col("x"), col("y")) * corr(col("x"), col("y"))).as("rho2"))
      .collect().head
    assert(math.abs(out.getAs[Double]("theta") -
      chk.getAs[Double]("theta")) < 1e-5)
    assert(math.abs(out.getAs[Double]("var_reduction") -
      chk.getAs[Double]("rho2")) < 1e-5)
    // A/A split: both arms populated, adjusted lift stays finite
    assert(out.getAs[Long]("n_a") > 0 && out.getAs[Long]("n_b") > 0)
    assert(!out.isNullAt(out.fieldIndex("lift_adj")))
  }

  test("jsDivergence: identical -> 0, disjoint -> ln 2, symmetric") {
    import graft.ext.Stats
    val sf = "/root/testdata/sf0.001"
    def row(df: org.apache.spark.sql.DataFrame) = {
      val r = df.collect().head
      graft.ops.CacheScope.releaseAll()
      (r.getAs[Long]("n_bins"), r.getAs[Double]("js_nats"),
        r.getAs[Double]("js_bits"))
    }
    // identical distributions (the same group on both sides): JSD = 0
    val docs = Tables.documents(spark, sf)
    val same = row(Stats.jsDivergence(docs, "n_chars", "source",
      "src0", "src0", binWidth = 32L))
    assert(same._2 == 0.0 && same._3 == 0.0)
    // disjoint supports: JSD = ln 2 exactly (1 bit)
    val dis = (0 until 10).map(v => (v.toLong, "a")) ++
      (0 until 10).map(v => (1000L + v, "b"))
    val disDf = dis.toDF("v", "grp")
    val d = row(Stats.jsDivergence(disDf, "v", "grp", "a", "b", 1L))
    assert(d._1 == 20L)
    assert(math.abs(d._2 - 0.693147) < 1e-9, "disjoint JSD = ln 2")
    assert(d._3 == 1.0, "disjoint JSD = 1 bit")
    // symmetry: swapping the groups cannot move the statistic
    val ab = row(Stats.jsDivergence(docs, "n_chars", "source",
      "src0", "src1", binWidth = 32L))
    val ba = row(Stats.jsDivergence(docs, "n_chars", "source",
      "src1", "src0", binWidth = 32L))
    assert(ab == ba)
    assert(ab._2 > 0.0 && ab._2 < 0.693148,
      "two real sources sit strictly inside (0, ln 2)")
  }

  test("truncationPairs: prefix twins pair, diverging prefixes and " +
      "equal lengths don't, stop-prefix prune fires") {
    import graft.ext.TextDedup
    val head = "x" * 32 // shared 32-char prefix for A and D
    val docs = Seq(
      (1L, head + "AAAA BBBB CCCC DDDD"), // A: full doc
      (2L, head + "AAAA BBBB"),           // B: strict prefix of A
      (3L, "completely different text padded to pass the length floor"),
      (4L, head + "ZZZZ YYYY"),           // D: same 32-prefix, diverges
      (5L, head + "AAAA 8888")            // E: same length as B, not dup
    ).toDF("doc_id", "text")
    val out = TextDedup.truncationPairs(docs, "text", "doc_id")
      .select("id_short", "id_long", "len_short", "len_long",
        "trunc_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    // only B -> A: D diverges after the shared prefix (candidate but
    // fails the exact verify), E has B's length (equal-length excluded
    // as exact-dedup territory), C shares no prefix
    assert(out.toSeq == Seq((2L, 1L, 41L, 51L,
      BigDecimal(41.0 / 51).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // stop-prefix prune: a bucket bigger than maxBucket emits nothing
    val none = TextDedup.truncationPairs(docs, "text", "doc_id",
      maxBucket = 2)
    assert(none.count() == 0L)
    graft.ops.CacheScope.releaseAll()
  }

  test("Lloyd.fit: independent plain-Scala recompute on a fixture, " +
      "monotone objective across rounds on testdata") {
    import graft.ext.Lloyd
    // --- constructed fixture: 6 vectors, dim 4, two loose blobs ---
    val vecs: Map[Long, Array[Float]] = Map(
      0L -> Array(1.0f, 0.1f, 0.0f, 0.0f),
      1L -> Array(0.9f, 0.0f, 0.1f, 0.0f),
      2L -> Array(1.1f, 0.0f, 0.0f, 0.1f),
      3L -> Array(0.0f, 0.1f, 0.0f, 1.0f),
      4L -> Array(0.1f, 0.0f, 0.0f, 0.9f),
      5L -> Array(0.0f, 0.0f, 0.1f, 1.1f))
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))
    val k = 2; val rounds = 3
    // --- plain-Scala replica of the documented semantics ---
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cent: Array[Array[Float]] = vecs.toSeq
      .sortBy { case (id, _) => (md5hex(s"km:$id"), id) }
      .take(k).map(_._2).toArray
    def assign(c: Array[Array[Float]]): Map[Long, (Int, Double)] =
      vecs.map { case (id, v) =>
        id -> c.zipWithIndex
          .map { case (cv, i) => (r6(dot(v, v) - 2 * dot(v, cv)
            + dot(cv, cv)), i) }
          .minBy(identity)
          .swap
      }
    def update(a: Map[Long, (Int, Double)]): Array[Array[Float]] =
      (0 until k).map { i =>
        val members = a.collect { case (id, (cid, _)) if cid == i =>
          vecs(id) }.toSeq
        if (members.isEmpty) cent(i)
        else (0 until 4).map { d =>
          val s = members.map(v => BigDecimal(v(d).toDouble)
            .setScale(12, BigDecimal.RoundingMode.HALF_UP))
            .foldLeft(BigDecimal(0))(_ + _)
          (s.toDouble / members.size).toFloat
        }.toArray
      }.toArray
    for (_ <- 1 until rounds) cent = update(assign(cent))
    val fin = assign(cent)
    val finalCent = update(fin)
    val expected = (0 until k).flatMap { i =>
      val m = fin.values.filter(_._1 == i)
      if (m.isEmpty) None else Some((i.toLong, m.size.toLong,
        r6(m.map(d => BigDecimal(d._2).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).foldLeft(BigDecimal(0))(_ + _)
          .toDouble),
        r6(finalCent(i)(0).toDouble), r6(finalCent(i)(1).toDouble),
        r6(finalCent(i)(2).toDouble), r6(finalCent(i)(3).toDouble)))
    }.toSet
    val got = Lloyd.fit(df, k = k, rounds = rounds)
      .select("cid", "n_members", "inertia", "c1", "c2", "c3", "c4")
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().toSet
    graft.ops.CacheScope.releaseAll()
    assert(got == expected, s"got $got expected $expected")
    // --- Lloyd objective is monotone non-increasing in rounds ---
    val sf = "/root/testdata/sf0.001"
    val inertias = (1 to 3).map { r =>
      val t = graft.ext.Lloyd.fit(Tables.embeddings(spark, sf),
        k = 8, rounds = r)
        .agg(org.apache.spark.sql.functions.sum("inertia"))
        .as[Double].collect().head
      graft.ops.CacheScope.releaseAll()
      t
    }
    assert(inertias.sliding(2).forall { case Seq(a, b) => b <= a + 1e-6 },
      s"objective must not increase: $inertias")
  }

  test("q_stream_kmeans_assign: streamed assignment == batch assignTo " +
      "on the same slice and model") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.streaming.StreamPipeline
      .kmeansAssignAvailableNow(spark, sf)
      .select("vec_id", "cid", "dist")
      .as[(Long, Int, Double)].collect().toSet
    val model = graft.ext.Lloyd.fitCentroids(
      Tables.embeddings(spark, sf), k = 8, updates = 3)
    val batch = graft.ext.Lloyd.assignTo(
      Tables.embeddings(spark, sf).filter(col("vec_id") % 5 === 0),
      model)
      .select("vec_id", "cid", "dist")
      .as[(Long, Int, Double)].collect().toSet
    graft.ops.CacheScope.releaseAll()
    assert(streamed.nonEmpty && streamed == batch)
    // every arriving vector gets exactly one assignment
    assert(streamed.size ==
      Tables.embeddings(spark, sf)
        .filter(col("vec_id") % 5 === 0).count())
  }

  test("woeIv: hand-computed WoE/IV, zero-cell category emits NULL " +
      "and contributes nothing") {
    // X: good 2 / bad 2; Y: good 3 / bad 1; Z: good 0 / bad 1.
    // G=5, B=4. woe_X = ln(0.4/0.5) = -0.223144,
    // woe_Y = ln(0.6/0.25) = 0.875469, woe_Z = NULL.
    // IV = (-0.1)(-0.223144) + (0.35)(0.875469) + 0
    //    = 0.0223144 + 0.30641415 = 0.328729 (6 dp).
    val rows = Seq(
      ("X", 0L), ("X", 0L), ("X", 1L), ("X", 1L),
      ("Y", 0L), ("Y", 0L), ("Y", 0L), ("Y", 1L),
      ("Z", 1L)).toDF("category", "target")
    val out = Featurize.woeIv(rows, "category", "target")
      .select("category", "n", "bad", "good", "woe", "iv")
      .as[(String, Long, Long, Long, Option[Double], Double)]
      .collect().map(r => r._1 -> r).toMap
    graft.ops.CacheScope.releaseAll()
    assert(out("X")._5.contains(-0.223144))
    assert(out("Y")._5.contains(0.875469))
    assert(out("Z")._5.isEmpty, "one-sided category has no WoE")
    assert(out.values.map(_._6).toSet == Set(0.328729))
  }

  test("quantileBins: full decile coverage, depth balance, ordered " +
      "non-overlapping ranges") {
    val sf = "/root/testdata/sf0.001"
    val out = Featurize.quantileBins(
      Tables.orders(spark, sf), "o_totalprice", nBins = 10)
      .orderBy("bin")
      .select("bin", "n", "lo", "hi")
      .as[(Int, Long, Double, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.map(_._1).toSeq == (1 to 10))
    val total = Tables.orders(spark, sf).count()
    assert(out.map(_._2).sum == total)
    // equi-depth on effectively-distinct values: every bin within
    // a couple of rows of total/10
    out.foreach { case (b, n, _, _) =>
      assert(math.abs(n - total / 10.0) <= 2.0,
        s"bin $b depth $n vs ${total / 10.0}")
    }
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 <= b._3, "ranges must not overlap")
      case _ =>
    }
  }

  test("distDiscPercentiles: identical values to Spark's own " +
      "percentile_disc aggregate, at every tie-heavy grid point") {
    import graft.ext.Stats
    val sf = "/root/testdata/sf0.001"
    // o_totalprice: effectively distinct; l_quantity: heavy ties —
    // both must agree with the single-task aggregate exactly
    for ((tbl, cn) <- Seq(
        Tables.orders(spark, sf) -> "o_totalprice",
        Tables.lineitem(spark, sf) -> "l_quantity")) {
      val v = tbl.select(col(cn).cast("double").as("v"))
      val ps = (1 to 9).map(i => (i, 10))
      val names = (1 to 9).map(i => s"p$i")
      val dist = Stats.distDiscPercentiles(v, "v", ps, names)
        .collect().head
      graft.ops.CacheScope.releaseAll()
      val refCols = (1 to 9).map(i =>
        expr(s"percentile_disc(0.$i) WITHIN GROUP (ORDER BY v)")
          .as(s"p$i"))
      val ref = v.agg(refCols.head, refCols.tail: _*).collect().head
      (0 until 9).foreach { j =>
        assert(dist.getDouble(j) == ref.getDouble(j),
          s"$cn p${j + 1}: dist ${dist.getDouble(j)} vs " +
            s"agg ${ref.getDouble(j)}")
      }
    }
  }

  test("distDiscPercentilesBy: per-group values identical to the " +
      "percentile_disc aggregate") {
    import graft.ext.Stats
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
      .select(col("event_type").as("g"), col("value").as("v"))
    val dist = Stats.distDiscPercentilesBy(ev, "v", "g",
      Seq((1, 4), (1, 2), (3, 4)), Seq("q1", "q2", "q3"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    graft.ops.CacheScope.releaseAll()
    val ref = ev.groupBy(col("g")).agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY v)").as("q1"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").as("q2"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)").as("q3"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(dist.keySet == ref.keySet && dist.keySet.size == 5)
    assert(dist == ref)
  }

  test("mannWhitney: hand-computed U and z, midrank ties, U_A+U_B " +
      "identity") {
    import graft.ext.Stats
    def run(rows: Seq[(Long, String)]): (Long, Long, Long, Option[Double]) = {
      val df = rows.toDF("v", "grp")
      val r = Stats.mannWhitney(df, "v", "grp", "a", "b").collect().head
      graft.ops.CacheScope.releaseAll()
      (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("u2_a"),
        Option(r.getAs[java.lang.Double]("z")).map(_.doubleValue()))
    }
    // disjoint, no ties: A={1,2,3} all below B={4,5,6} -> U_A = 0,
    // z = -4.5/sqrt(3*3*7/12) = -1.963961
    val d = run(Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")))
    assert(d == ((3L, 3L, 0L, Some(-1.963961))))
    // ties use midranks: A={1,1}, B={1,2} -> R_A = 4 (midrank 2 twice),
    // 2U_A = 8 - n_a(n_a+1) = 2; tie-corrected var = 1 -> z = -1
    val t = run(Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b")))
    assert(t == ((2L, 2L, 2L, Some(-1.0))))
    // U_A + U_B = n_a * n_b (swap the groups)
    val fwd = run(Seq((1L, "a"), (3L, "a"), (2L, "b"), (4L, "b")))
    val bwd = run(Seq((1L, "b"), (3L, "b"), (2L, "a"), (4L, "a")))
    assert(fwd._3 + bwd._3 == 2L * (2L * 2L), "2U_A + 2U_B = 2*n_a*n_b")
  }

  test("ext_tokenizer_coverage: rates recompute, every source reported") {
    val sf = "/root/testdata/sf0.001"
    val out = ExtQueries3.tokenizerCoverageQ.run(spark, sf)
      .select("source", "n_tokens", "oov_tokens", "token_oov_rate",
        "n_types", "oov_types", "type_oov_rate")
      .as[(String, Long, Long, Double, Long, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.length == 20, "every source gets a coverage row")
    out.foreach { case (src, nt, ot, tor, ny, oy, tyr) =>
      assert(ot <= nt && oy <= ny)
      assert(math.abs(tor - ot.toDouble / nt) < 1e-6)
      assert(math.abs(tyr - oy.toDouble / ny) < 1e-6)
    }
    // the corpus shares a small vocabulary, so the 200-term vocab
    // covers the bulk of every source's token mass
    assert(out.forall(_._4 < 0.5), "token OOV below 50% everywhere")
  }

  test("incrementalLshPairs: near-dups and exact copies collide with " +
      "the archive index; unrelated text never verifies") {
    import graft.ext.TextDedup
    val a1 = "the quick brown fox jumps over the lazy dog near the " +
      "river bank today with great speed and joy in the morning"
    val a2 = "spark streams shuffle partitions across the cluster " +
      "while the optimizer prunes columns and pushes filters down"
    val archive = Seq((10L, a1), (20L, a2)).toDF("doc_id", "text")
    val (idxB, idxH) = TextDedup.lshIndex(archive, "text", "doc_id")
    val incoming = Seq(
      (100L, a1 + " extra token"), // near-dup of 10
      (200L, a2),                  // exact copy of 20
      (300L, "completely different content about databases and " +
        "indexes that shares no shingles with the archive at all"))
      .toDF("doc_id", "text")
    val out = TextDedup.incrementalLshPairs(incoming, "text", "doc_id",
      idxB, idxH, threshold = 0.5)
      .select("doc_id", "archive_id", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    graft.ops.CacheScope.releaseAll()
    assert(out.map(p => (p._1, p._2)) == Set((100L, 10L), (200L, 20L)),
      s"got $out")
    assert(out.find(_._1 == 200L).get._3 == 1.0,
      "an exact copy scores Jaccard 1")
    assert(out.find(_._1 == 100L).get._3 >= 0.8,
      "a two-token append stays a high-Jaccard near-dup")
  }

  test("constellationMatches: re-cut lands on its source at the " +
      "constant offset, dissimilar tracks never vote through") {
    import graft.ext.Multimodal
    // 80-char track with a NON-repeating byte pattern (repeats would
    // make landmark hashes collide at many offsets)
    val body = (0 until 80).map(i => ('a' + (i * 7 + i / 9) % 26).toChar)
      .mkString
    val other = (0 until 80).map(i => ('A' + (i * 11 + 3) % 26).toChar)
      .mkString
    val tracks = Seq((1L, body), (2L, other)).toDF("doc_id", "text")
    // query = track 1 trimmed by 2 steps (8 bytes at stride 4)
    val queries = Seq((100L, body.substring(8))).toDF("doc_id", "text")
    val out = Multimodal.constellationMatches(
      tracks, queries, "doc_id", "text", minVotes = 5L)
      .select("query_id", "track_id", "delta", "votes")
      .as[(Long, Long, Int, Long)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.length == 1, s"only the true source survives: ${out.toSeq}")
    val (q, tr, delta, votes) = out.head
    assert(q == 100L && tr == 1L)
    assert(delta == -2, "a head-trim of 2 steps votes at offset -2")
    // nearly every landmark of the trimmed query exists in the source
    assert(votes >= 30)
  }

  test("rakeKeyphrases: hand-computed RAKE scores on a fixture") {
    // phrases: "deep learning"(2), "fast gradient method"(3),
    // "deep method"(2).
    // freq: deep 2, learning 1, fast 1, gradient 1, method 2.
    // deg:  deep 2+2=4, learning 2, fast 3, gradient 3, method 3+2=5.
    // word scores: deep 2.0, learning 2.0, fast 3.0, gradient 3.0,
    //   method 2.5.
    // phrase scores: "fast gradient method" 8.5, "deep method" 4.5,
    //   "deep learning" 4.0.
    val docs = Seq(
      (1L, "deep learning the fast gradient method a deep method"))
      .toDF("doc_id", "text")
    val out = Retrieval.rakeKeyphrases(docs, "text", "doc_id",
      stopwords = Seq("the", "a"), k = 3)
      .orderBy("rank")
      .select("doc_id", "rank", "phrase", "score")
      .as[(Long, Int, String, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.toSeq == Seq(
      (1L, 1, "fast gradient method", 8.5),
      (1L, 2, "deep method", 4.5),
      (1L, 3, "deep learning", 4.0)))
  }

  test("keySkew: counts, shares, hot factor, (count desc, key asc) " +
      "order, and the top-N cut") {
    // keys: a x4, b x2, c/d/e x1 -> total 9, n_keys 5, mean 1.8
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d", "e"))
      .toDF("k")
    val out = graft.ops.Profiling.keySkew(df, "k", topN = 3)
      .select("rank", "key", "n", "share", "hot_factor")
      .as[(Int, String, Long, Double, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    assert(out.toSeq == Seq(
      (1, "a", 4L, math.rint(4.0 / 9 * 1e9) / 1e9,
        math.rint(4.0 * 5 / 9 * 1e6) / 1e6),
      (2, "b", 2L, math.rint(2.0 / 9 * 1e9) / 1e9,
        math.rint(2.0 * 5 / 9 * 1e6) / 1e6),
      (3, "c", 1L, math.rint(1.0 / 9 * 1e9) / 1e9,
        math.rint(1.0 * 5 / 9 * 1e6) / 1e6)))
  }

  test("DqConstraints: rulebook counts violations in one scan, FK " +
      "orphans (incl. NULL keys) anti-join out") {
    val df = Seq((1, 10.0), (2, -5.0), (60, 3.0), (3, 0.0))
      .toDF("qty", "price")
    val rep = graft.ops.DqConstraints.checkRules(df, Seq(
      "qty_range" -> (col("qty") < 1 || col("qty") > 50),
      "bad_price" -> (col("price") <= 0)))
      .select("rule", "n_checked", "n_violations", "violation_rate")
      .as[(String, Long, Long, Double)].collect().toSet
    assert(rep == Set(
      ("qty_range", 4L, 1L, 0.25),
      ("bad_price", 4L, 2L, 0.5)))
    val child = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"),
      (99L, "c"), (null, "d")).toDF("k", "v")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val fk = graft.ops.DqConstraints
      .fkOrphans(child, "k", parent, "pk", "orphans")
      .select("rule", "n_checked", "n_violations", "violation_rate")
      .as[(String, Long, Long, Double)].head()
    // 99 has no parent and the NULL key never equi-matches -> 2 orphans
    assert(fk == ("orphans", 4L, 2L, 0.5))
  }

  test("ecdf: cume_dist recomputes, NULLs excluded, monotone to 1.0") {
    val df = Seq[java.lang.Double](5.0, 5.0, 1.0, 3.0, null, 3.0, 3.0)
      .toDF("v")
    val out = graft.ext.Stats.ecdf(df, "v")
      .orderBy("v").select("v", "n", "cume_dist")
      .as[(Double, Long, Double)].collect()
    graft.ops.CacheScope.releaseAll()
    // 6 non-null rows: 1.0 -> 1/6, 3.0 -> 4/6, 5.0 -> 6/6
    assert(out.toSeq == Seq(
      (1.0, 1L, math.rint(1.0 / 6 * 1e9) / 1e9),
      (3.0, 3L, math.rint(4.0 / 6 * 1e9) / 1e9),
      (5.0, 2L, 1.0)))
  }
}
