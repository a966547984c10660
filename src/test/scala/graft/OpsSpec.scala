package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CleaningOps, RelationalOps}

/** Unit tests for the relational/cleaning operator combinators
  * (SURVEY.md §5.2: trim semantics, mode tie-break, IQR degenerate
  * fences, dictionary ranking). */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trimLowImportance keeps only rows popular on BOTH keys, single pass") {
    // item 1 has 3 rows, item 2 has 1; user a has 3 rows, user b has 1.
    val fact = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a"))
      .toDF("item", "user")
    val out = RelationalOps.trimLowImportance(fact, "item", 2, "user", 2)
      .select("item", "user").as[(Int, String)].collect()
    // single pass like the reference: user counts are over ALL items,
    // so (1, a) survives ×2 and nothing else
    assert(out.length == 2)
    assert(out.forall(r => r == ((1, "a"))))
  }

  test("modeOf breaks ties by smallest value") {
    val df = Seq("b", "a", "b", "a", "c").toDF("v")
    val m = RelationalOps.modeOf(df, "v").collect()
    assert(m.length == 1 && m(0).getString(0) == "a" && m(0).getLong(1) == 2L)
  }

  test("removeOutliersIqr drops far outliers, keeps the bulk") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    assert(RelationalOps.removeOutliersIqr(df, Seq("x")).count() == 100)
    val withOutlier = ((1 to 20).map(_.toDouble) :+ 1e6).toDF("x")
    val kept = RelationalOps.removeOutliersIqr(withOutlier, Seq("x"))
      .as[Double].collect()
    assert(!kept.contains(1e6) && kept.length == 20)
  }

  test("removeOutliersIqr degenerate IQR=0 keeps equal values (>=/<= branch)") {
    val df = (Seq.fill(10)(10.0) :+ 1000.0).toDF("x")
    // Q1 = Q3 = 10 → IQR 0; strict fences would drop everything, the
    // inclusive branch keeps exactly the constant bulk
    val kept = RelationalOps.removeOutliersIqr(df, Seq("x")).as[Double].collect()
    assert(kept.length == 10 && kept.forall(_ == 10.0))
  }

  test("zipWithRank = row_number over sorted order, distributed") {
    val df = Seq("c", "a", "d", "b").toDF("v").repartition(3)
    val ranked = RelationalOps.zipWithRank(df, Seq(col("v")), "rk")
      .as[(String, Long)].collect().sortBy(_._2)
    assert(ranked.toSeq == Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
  }

  test("frequencyIndex: most frequent value gets index 0, ties by value") {
    val df = Seq("x", "y", "y", "z", "z").toDF("v")
    val idx = RelationalOps.frequencyIndex(df, "v")
      .select("v", "idx").as[(String, Long)].collect().toMap
    assert(idx == Map("y" -> 0L, "z" -> 1L, "x" -> 2L))
  }

  test("StringIndexer (M1) ranks by descending frequency like the relational analog") {
    // SURVEY §7.3: the ML dictionary (reference PDF §3 'most frequent
    // label gets index 0') must agree with frequencyIndex on untied data
    val df = Seq("a", "b", "b", "c", "c", "c").toDF("v")
    val ml = graft.ml.FeaturePipeline.indexString(df, "v", "v_idx")
      .select("v", "v_idx").as[(String, Double)].collect()
      .toSet.map((t: (String, Double)) => (t._1, t._2.toLong))
    val rel = RelationalOps.frequencyIndex(df, "v")
      .select("v", "idx").as[(String, Long)].collect().toSet
    assert(ml == rel && rel == Set(("c", 0L), ("b", 1L), ("a", 2L)))
  }

  test("topKPerGroup emits at most k rows per group, rank contiguous") {
    val df = Seq(("g1", 5.0), ("g1", 3.0), ("g1", 9.0), ("g2", 1.0))
      .toDF("g", "s")
    val out = RelationalOps.topKPerGroup(df, Seq(col("g")),
      Seq(col("s").desc), k = 2).collect()
    val byG = out.groupBy(_.getString(0))
    assert(byG("g1").length == 2 && byG("g2").length == 1)
    assert(byG("g1").map(_.getDouble(1)).toSet == Set(9.0, 5.0))
  }

  test("nullAudit counts nulls per column in one row") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (None, None))
      .toDF("i", "s")
    val r = CleaningOps.nullAudit(df).collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
  }

  test("fillWithMean / fillWithMode impute in-plan") {
    val df = Seq(Some(1.0), Some(3.0), None).toDF("x")
    val filled = CleaningOps.fillWithMean(df, "x").as[Double].collect().sorted
    assert(filled.toSeq == Seq(1.0, 2.0, 3.0))
    val s = Seq(Some("a"), Some("a"), Some("b"), None).toDF("v")
    val modeFilled = CleaningOps.fillWithMode(s, "v").as[String].collect()
    assert(modeFilled.count(_ == "a") == 3)
  }

  test("sentinelToNull + binaryToCategorical + sanitizeNames") {
    val df = Seq("[]", "real").toDF("v")
    val nulled = CleaningOps.sentinelToNull(df, "v", lit("[]"))
    assert(nulled.filter(col("v").isNull).count() == 1)

    val flags = Seq((5, 100.0), (30, 1000.0)).toDF("size", "price")
    val tagged = CleaningOps.binaryToCategorical(flags,
      Seq("large" -> (col("size") > 25), "pricey" -> (col("price") > 900)),
      "tags").select("tags").as[String].collect().sorted
    assert(tagged.toSeq == Seq("", "large, pricey"))

    val dotted = Seq((1, 2)).toDF("a.b", "c.d.e")
    assert(CleaningOps.sanitizeNames(dotted).columns.toSeq == Seq("ab", "cde"))
  }

  test("zeroVariancePrune drops constant columns only") {
    val df = Seq((1.0, 7.0), (2.0, 7.0), (3.0, 7.0)).toDF("varies", "const")
    val pruned = CleaningOps.zeroVariancePrune(df, Seq("varies", "const"))
    assert(pruned.columns.toSeq == Seq("varies"))
  }

  test("saltedJoin == plain inner join (multiset)") {
    val fact = Seq((1, "x"), (1, "y"), (2, "z"), (1, "w"), (3, "q"))
      .toDF("k", "v")
    val dim = Seq((1, "A"), (2, "B")).toDF("k", "d")
    val salted = RelationalOps.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "v", "d").as[(Int, String, String)].collect().sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "d").as[(Int, String, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("saltedJoin tolerates unhashable (MapType) fact columns") {
    // xxhash64 over a MapType column throws AnalysisException; the salt
    // must exclude such columns (ADVICE r17) and still join correctly
    val fact = Seq((1, "x"), (1, "y"), (2, "z"))
      .toDF("k", "v")
      .withColumn("m", map(col("v"), col("k")))
    val dim = Seq((1, "A"), (2, "B")).toDF("k", "d")
    val salted = RelationalOps.saltedJoin(fact, dim, "k", salts = 4)
      .select("k", "v", "d").as[(Int, String, String)].collect().sorted.toSeq
    val plain = fact.join(dim, Seq("k"))
      .select("k", "v", "d").as[(Int, String, String)].collect().sorted.toSeq
    assert(salted == plain && plain.nonEmpty)
  }

  test("writeBucketed table joins without exchange below the join") {
    val spark2 = spark
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    val tmp = TestSpark.tempDir("graft_bkt").toString
    graft.sources.Sources.writeBucketed(df, "bkt_a", s"$tmp/a", "k", 4)
    graft.sources.Sources.writeBucketed(df, "bkt_b", s"$tmp/b", "k", 4)
    val joined = spark2.table("bkt_a")
      .join(spark2.table("bkt_b").hint("merge"), Seq("k"))
    val plan = joined.queryExecution.executedPlan.toString
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinPart.contains("Exchange"), s"unexpected exchange:\n$plan")
    assert(joined.count() == 100)
  }

  test("range-clustered write produces non-overlapping per-file shipdate ranges") {
    // run the registered query once so the staged layout exists, then
    // audit the files it wrote: disjoint [min,max] slices per file are
    // WHAT makes footer-stat skipping effective (q70's claim)
    val d = "/root/testdata/sf0.001"
    QueryRegistry.byName("q70_range_cluster").fn(spark, d).collect()
    val staged = spark.read.parquet(Staging.dir("rangecluster", d))
    val ranges = staged
      .groupBy(input_file_name().as("f"))
      .agg(min("l_shipdate").as("lo"), max("l_shipdate").as("hi"))
      .select("lo", "hi")
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect()
      .sortBy(_._1.getTime)
    assert(ranges.length > 1, "expected multiple range-clustered files")
    ranges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(!hi.after(lo), s"overlapping file ranges: hi=$hi lo=$lo")
    }
  }

  test("zOrderKey bit-interleave is exact; clustered files bound BOTH dimensions") {
    // 1) exhaustive 8-bit equality against a scalar reference Morton
    def refMorton(rx: Long, ry: Long): Long =
      (0 until 8).foldLeft(0L) { (acc, i) =>
        acc | (((rx >> i) & 1L) << (2 * i)) | (((ry >> i) & 1L) << (2 * i + 1))
      }
    val pairs = for { rx <- 0 until 256; ry <- 0 until 256 }
      yield (rx.toLong, ry.toLong, refMorton(rx.toLong, ry.toLong))
    val bad = pairs.toDF("rx", "ry", "expect")
      .withColumn("z", RelationalOps.zOrderKey(col("rx"), col("ry"), 8))
      .filter(col("z") =!= col("expect")).count()
    assert(bad == 0, s"$bad of 65536 interleaves wrong")

    // 2) run the registered query, audit the staged layout
    val d = "/root/testdata/sf0.001"
    assume(new java.io.File(d).isDirectory, s"$d fixture not present")
    QueryRegistry.byName("q89_zorder_cluster").fn(spark, d).collect()
    val staged = spark.read.parquet(Staging.dir("zorder", d))
      .select(input_file_name().as("f"), col("zkey"))
      .as[(String, Long)].collect()
    // zkey file ranges must be disjoint (what repartitionByRange buys)
    val zRanges = staged.groupBy(_._1).values
      .map(rs => (rs.map(_._2).min, rs.map(_._2).max)).toArray.sortBy(_._1)
    assert(zRanges.length > 1, "expected multiple z-clustered files")
    zRanges.sliding(2).foreach { case Array((_, hi), (lo, _)) =>
      assert(hi <= lo, s"overlapping file z-ranges: hi=$hi lo=$lo")
    }
    // the point of z-order vs 1-D clustering: BOTH rank dimensions stay
    // bounded per file. De-interleave the keys and compare the mean
    // per-file y-extent against the same rows 1-D-clustered on x alone
    // (which leaves y near its full width): z-order must at least halve
    // it, while keeping the x-extent under ~60% of the rank space.
    def deX(z: Long) = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
    def deY(z: Long) = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
    val pts = staged.map { case (f, z) => (f, deX(z), deY(z)) }
    def meanExtent(groups: Iterable[Array[(Long, Long)]],
                   pick: ((Long, Long)) => Long): Double = {
      val es = groups.map { g =>
        val v = g.map(pick); (v.max - v.min + 1).toDouble }
      es.sum / es.size
    }
    val zGroups = pts.groupBy(_._1).values
      .map(_.map(p => (p._2, p._3))).toList
    val sortedByX = pts.map(p => (p._2, p._3)).sortBy(identity)
    val n = sortedByX.length
    val xGroups = (0 until 8).map(k =>
      sortedByX.slice(k * n / 8, (k + 1) * n / 8)).toList
    val zY = meanExtent(zGroups, _._2)
    val baseY = meanExtent(xGroups, _._2)
    val zX = meanExtent(zGroups, _._1)
    assert(zY < 0.75 * baseY,
      s"z-order mean y-extent $zY not < 0.75 × 1-D baseline $baseY")
    assert(zX <= 160.0, s"z-order mean x-extent $zX exceeds 160/256")
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    // salting (q50) is the explicit skew tool; this proves the RUNTIME
    // lever — AQE re-plans a skewed SMJ into split sub-partitions after
    // seeing the actual shuffle sizes. Thresholds lowered so the fixture
    // triggers what a hot key does at TB scale.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // xxhash payload defeats shuffle compression — the skew detector
      // sees COMPRESSED map-output sizes, and a constant-key column of
      // constants compresses below any realistic threshold
      val fact = spark.range(1000000)
        .select(lit(1L).as("k"), xxhash64(col("id")).as("v"))
        .union(spark.range(200)
          .select((col("id") % 10 + 2).as("k"), xxhash64(col("id")).as("v")))
      val dim = spark.range(12).select(col("id").as("k"), (col("id") * 2).as("d"))
      val j = fact.join(dim, Seq("k"))
      // drive THIS queryExecution's own RDD: df.count() builds a separate
      // Aggregate plan, and the adaptive final plan (isFinalPlan=true)
      // only exists on the execution that actually ran
      val qe = j.queryExecution
      assert(qe.executedPlan.execute().count() == 1000200)
      val plan = qe.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    // Catalyst's InjectRuntimeFilter: a selective filter on the dim side
    // spawns a bloom_filter_agg subquery whose result pre-filters the
    // fact scan (might_contain) BEFORE the join shuffle — rows that
    // cannot match never get shuffled. At production scale the 10 GB
    // application-side threshold triggers this automatically; the test
    // zeroes it so the fixture-sized join demonstrates the same plan.
    val c = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> c.getOption(k))
    val tmp = TestSpark.tempDir("graft_bloom").toString
    try {
      c.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.range(100000).select(col("id").as("k"), xxhash64(col("id")).as("v"))
        .write.mode("overwrite").parquet(s"$tmp/fact")
      spark.range(10000).select(col("id").as("k"), (col("id") % 100).as("grp"))
        .write.mode("overwrite").parquet(s"$tmp/dim")
      val fact = spark.read.parquet(s"$tmp/fact")
      val dim = spark.read.parquet(s"$tmp/dim").filter(col("grp") === 7)
      val j = fact.join(dim, Seq("k"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${plan.take(3000)}")
      assert(j.count() == 100)
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }

  test("operator contracts on empty/degenerate inputs") {
    import org.apache.spark.sql.types._
    // asOfJoin: empty right side → left-outer nulls, row count preserved
    val left = Seq((1, 10L, 1.0), (2, 20L, 2.0)).toDF("k", "t", "lv")
    val emptyRight = Seq.empty[(Int, Long, Double)].toDF("k", "t", "rv")
    val asOf = RelationalOps.asOfJoin(left, emptyRight, "k", "t")
    assert(asOf.count() == 2 && asOf.filter(col("asof").isNull).count() == 2)
    // bandJoin: no overlap → empty, never an error
    val bj = RelationalOps.bandJoin(
      Seq((100L, 1)).toDF("lt", "lid"), Seq((500L, 2)).toDF("rt", "rid"),
      "lt", "rt", 10L)
    assert(bj.count() == 0)
    // connectedComponents: empty edge list → empty labels
    val cc = graft.ext.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(cc.count() == 0)
    // quantizeInt8: all-zero vector → scale floor, zero codes, roundtrip 0
    val qz = graft.ext.Similarity
      .quantizeInt8(Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding"),
        "embedding")
      .select(col("q8"), col("q8_scale"))
      .as[(Seq[Byte], Double)].head()
    assert(qz._1 == Seq[Byte](0, 0) && qz._2 > 0.0)
  }

  test("CSV inferSchema roundtrip preserves values and types") {
    val df = Seq((1L, "alpha", 12.75), (2L, "beta", -3.5))
      .toDF("id", "name", "score")
    val tmp = TestSpark.tempDir("graft_csv_spec").toString
    graft.sources.Sources.writeCsv(df, tmp)
    // scale-path sink: one file per partition, no single-task funnel
    val tmpD = TestSpark.tempDir("graft_csvd_spec").toString
    graft.sources.Sources.writeCsvDistributed(df.repartition(3), tmpD)
    assert(new java.io.File(tmpD).listFiles().count(_.getName.endsWith(".csv")) > 1)
    val back = graft.sources.Sources.csv(spark, tmp) // S1 inferred-schema path
    // inference picks the narrowest integral type (int here, like the
    // reference's inferSchema=True runs)
    assert(back.schema.map(_.dataType.typeName).toSeq ==
      Seq("integer", "string", "double"))
    assert(back.selectExpr("cast(id as long)", "name", "score")
      .as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 12.75), (2L, "beta", -3.5)))
  }

  test("minMaxScale maps to [0,1] with endpoints hit") {
    val df = Seq(10.0, 20.0, 30.0).toDF("x")
    val scaled = RelationalOps.minMaxScale(df, "x", "s")
      .select("s").as[Double].collect().sorted
    assert(scaled.toSeq == Seq(0.0, 0.5, 1.0))
  }

  test("minMaxScale degenerate range: constant column maps to 0.5") {
    // Spark ML MinMaxScaler's constant-column semantic; the unguarded
    // form is a DIVIDE_BY_ZERO under Spark 4's default ANSI mode for
    // integral columns (and a silent NaN for doubles)
    val const = Seq(7L, 7L, 7L).toDF("x")
    assert(RelationalOps.minMaxScale(const, "x", "s")
      .select("s").as[Double].collect().toSeq == Seq(0.5, 0.5, 0.5))
    val single = Seq(3.25).toDF("x")
    assert(RelationalOps.minMaxScale(single, "x", "s")
      .select("s").as[Double].collect().toSeq == Seq(0.5))
  }

  test("connectedComponents runs one job per round (accumulator convergence)") {
    // path graph 1-2-3-4-5-6: the min label walks one hop per round, so
    // 5 propagation rounds + 1 quiet round prove convergence. Each round
    // must cost exactly ONE job (the count that materializes the next
    // label table and tallies the changed-flags accumulator) — the old
    // shape paid a second isEmpty probe per round. Expected: 1 job for
    // the symmetrized edge materialization + 6 round jobs = 7.
    // AQE submits one JOB per query stage and a broadcast-hash join one
    // per broadcast build — both would hide the action-count claim under
    // physical-plan noise. Disable them here so one ACTION == one job
    // and the assertion is exact.
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val sc = spark.sparkContext
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup("cc-jobs", "connectedComponents job audit")
    val labels = try graft.ext.Dedup.connectedComponents(edges, "a", "b")
      finally {
        sc.clearJobGroup()
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    // status listener is async: poll until the job count stops moving
    def groupJobs: Int = sc.statusTracker.getJobIdsForGroup("cc-jobs").length
    var (prev, cur, spins) = (-1, groupJobs, 0)
    while (prev != cur && spins < 50) {
      prev = cur; Thread.sleep(100); cur = groupJobs; spins += 1
    }
    assert(cur <= 8, s"expected ~7 jobs (1 edge-materialize + 6 rounds), got $cur")
    // and the answer is still right: one component labeled by its min
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == 6 && out.forall(_._2 == 1L))
  }

  test("minhash params: no shared minimizer across hash functions (rank-1 guard)") {
    // The defect class the sf0.1 promotion caught in round 7: with
    // a_i = (i+1)·c the whole family factored through one base hash, so
    // ONE shingle minimized every h_i simultaneously and the signature
    // carried ~1 effective hash. Guard: over a fixed 200-element id set,
    // the per-function argmins must be genuinely diverse — a rank-1
    // family yields exactly 1 distinct argmin; an independent family
    // yields ~min(numHashes, distinct-minima) of them.
    val p = graft.ext.Dedup.MinhashPrime
    val ids = (1L to 200L).map(x => x * 982451653L % p) // spread sample
    val numHashes = 24
    val argmins = (0 until numHashes).map { i =>
      val (a, b) = graft.ext.Dedup.hashParams(i)
      ids.minBy(x => (Math.floorMod(x, p) * a + b) % p)
    }
    assert(argmins.distinct.size >= numHashes / 2,
      s"only ${argmins.distinct.size} distinct argmins across $numHashes " +
        "hash functions — the family is collapsing toward rank-1 again")
    // and the parameters themselves are in range and collision-free
    val params = (0 until 64).map(graft.ext.Dedup.hashParams)
    assert(params.forall { case (a, b) =>
      a >= 1 && a < p && b >= 0 && b < p })
    assert(params.map(_._1).distinct.size == 64 &&
      params.map(_._2).distinct.size == 64)
  }

  test("row-local minhash banding == exploded production path") {
    // the row-fused production path must emit the EXACT (id, band,
    // bucket) set the explode → xxhash64 → aggregate composition does —
    // same shingles, same hash family, zero shuffle
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").limit(100)
    val exploded = graft.ext.Dedup.minhashBuckets(
      graft.ext.Dedup.shingleIds(
        graft.ext.Dedup.shingles(docs, "doc_id", "text", 3),
        useDictionaryIds = false),
      "doc_id", numHashes = 24, rowsPerBand = 3)
    val rowLocal = graft.ext.Dedup.minhashBucketsRowLocal(
      docs, "doc_id", "text", n = 3, numHashes = 24, rowsPerBand = 3)
    assert(exploded.exceptAll(rowLocal).isEmpty &&
      rowLocal.exceptAll(exploded).isEmpty,
      "row-local and exploded production banding disagree")
    // a doc too short for a single 3-gram emits no bucket rows (matches
    // the exploded path, where it never reaches the aggregation)
    val shorty = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(graft.ext.Dedup.minhashBucketsRowLocal(
      shorty, "doc_id", "text", 3, 8, 4).count() == 0)
  }

  test("star CC converges on a long path where min-label provably cannot") {
    // 100-node path 0-1-2-...-99: the min label walks ONE hop per round,
    // so min-label needs 99 rounds — capped at 15 it must fail loudly.
    // Large-star/small-star halves long tails every round (polylog rounds):
    // the same 15-round budget is plenty, and every node must land on
    // label 0.
    val path = (0L until 99L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalStateException] {
      graft.ext.Dedup.connectedComponents(path, "a", "b", maxIter = 15)
        .count()
    }
    val star = graft.ext.Dedup
      .connectedComponents(path, "a", "b", maxIter = 15, algorithm = "star")
      .as[(Long, Long)].collect()
    assert(star.length == 100 && star.forall(_._2 == 0L),
      s"expected 100 nodes all labeled 0, got ${star.take(5).mkString(",")}")
    // unknown algorithm name must be rejected, not silently defaulted
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.connectedComponents(path, "a", "b",
        algorithm = "labelprop")
    }
  }

  test("star CC runs one job per round (folded fixpoint probe)") {
    // mirror of the min-label job audit: each star round must cost
    // exactly ONE job — the count that materializes the round's edge
    // set while an accumulator tallies the "edge is new" flags (the old
    // shape paid a second exceptAll probe whenever counts matched).
    // Path 1-2-3-4-5-6 contracts in 4 rounds (two tail-folds, one
    // star-completion, one quiet fixpoint round), so the inventory is:
    // 1 initial canonical-edge anchor + 4 round jobs + 1 final label
    // materialization (the node anchor rides it lazily) = 6 jobs.
    // AQE/broadcast-build jobs would hide the claim — disable as above.
    val edges = (1L to 5L).map(i => (i, i + 1)).toDF("a", "b")
    val sc = spark.sparkContext
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sc.setJobGroup("cc-star-jobs", "star CC job audit")
    val labels = try graft.ext.Dedup.connectedComponents(
        edges, "a", "b", algorithm = "star")
      finally {
        sc.clearJobGroup()
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    def groupJobs: Int = sc.statusTracker.getJobIdsForGroup("cc-star-jobs").length
    var (prev, cur, spins) = (-1, groupJobs, 0)
    while (prev != cur && spins < 50) {
      prev = cur; Thread.sleep(100); cur = groupJobs; spins += 1
    }
    assert(cur <= 7, s"expected ~6 jobs (1 edge anchor + 4 rounds + " +
      s"1 label materialize), got $cur")
    val out = labels.as[(Long, Long)].collect()
    assert(out.length == 6 && out.forall(_._2 == 1L))
  }

  test("CC with a reliable checkpoint dir: labels identical, files written") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cc_cp").toString
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val plain = graft.ext.Dedup.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    def filesUnder(d: java.io.File): Int = {
      val kids = Option(d.listFiles()).getOrElse(Array.empty)
      kids.count(_.isFile) + kids.filter(_.isDirectory).map(filesUnder).sum
    }
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
        .foreach(deleteRec)
      f.delete()
    }
    try {
      for (algo <- Seq("minlabel", "star")) {
        val before = filesUnder(new java.io.File(dir))
        val cpBefore = spark.sparkContext.getCheckpointDir
        val cp = graft.ext.Dedup.connectedComponents(edges, "a", "b",
            checkpointDir = Some(dir), algorithm = algo)
          .as[(Long, Long)].collect().toMap
        assert(cp == plain, s"$algo: checkpointed labels differ")
        // the per-round RDDs really were checkpointed (executor-loss
        // survival path), not just persisted
        assert(filesUnder(new java.io.File(dir)) > before,
          s"$algo: no checkpoint files written under $dir")
        // the session-global checkpoint setting must come back: a CC run
        // must not silently redirect later checkpoint users to its dir
        assert(spark.sparkContext.getCheckpointDir == cpBefore,
          s"$algo: session checkpoint dir left mutated")
      }
    } finally deleteRec(new java.io.File(dir))
  }

  test("repeated CC runs with a pre-set session checkpoint dir restore at a " +
      "bounded depth (no per-call nesting)") {
    // Spark's setCheckpointDir resolves a fresh uuid subdir, so a naive
    // restore-by-resolved-path re-anchors one level deeper per CC call
    // (ADVICE r9). CheckpointScope pins the root: depth must stay
    // constant across repeated calls, one level under the prior dir.
    val userRoot = java.nio.file.Files.createTempDirectory("graft_cc_user_cp")
    val ccDir = java.nio.file.Files.createTempDirectory("graft_cc_loop_cp")
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "test precondition: shared session must start with no checkpoint dir")
    try {
      sc.setCheckpointDir(userRoot.toString)
      val firstResolved = sc.getCheckpointDir.get
      val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
      // getCheckpointDir returns a QUALIFIED uri (file:/tmp/...); strip
      // the scheme/authority before counting so depth is measured on the
      // filesystem path alone, whatever qualification Spark applies
      def depthOf(p: String): Int =
        java.nio.file.Paths.get(new java.net.URI(p).getPath).getNameCount
      val depths = (1 to 3).map { _ =>
        graft.ext.Dedup.connectedComponents(edges, "a", "b",
          checkpointDir = Some(ccDir.toString)).count()
        depthOf(sc.getCheckpointDir.get)
      }
      assert(depths.distinct.size == 1, s"restore depth drifted: $depths")
      assert(depths.head == depthOf(firstResolved) + 1,
        s"restore not anchored one level under the prior dir: $depths")
      // getCheckpointDir returns a QUALIFIED uri (file:/tmp/...), so
      // containment, not startsWith, against the raw tmp path
      assert(sc.getCheckpointDir.get.contains(userRoot.toString),
        "restore left the user's checkpoint root")
    } finally {
      sc.setCheckpointDir(null) // back to the shared session's unset state
      graft.Staging.deleteRecursively(userRoot)
      graft.Staging.deleteRecursively(ccDir)
    }
  }

  test("CheckpointScope.restore suppresses its failure into a pending " +
      "primary exception (finally-block safety)") {
    // restore() runs in callers' finally blocks; when the loop's own
    // exception is already propagating, a restore failure (deleted root,
    // mkdirs refusal) must not escape and REPLACE it — it lands on the
    // primary's suppressed list instead (ADVICE r10/r11). Forced here
    // with a prev path nested under a plain FILE, which the local
    // filesystem refuses to mkdirs under.
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "test precondition: shared session must start with no checkpoint dir")
    val scoped = java.nio.file.Files.createTempDirectory("graft_cp_scoped")
    val blocker = java.nio.file.Files.createTempFile("graft_cp_blocker", "")
    try {
      sc.setCheckpointDir(scoped.toString)
      val scopedResolved = sc.getCheckpointDir
      val primary = new RuntimeException("loop's own failure")
      graft.CheckpointScope.restore(sc, Some(s"$blocker/nested"),
        Some(primary)) // must not throw — primary is in flight
      assert(primary.getSuppressed.nonEmpty,
        "restore failure should be preserved on the primary's suppressed list")
      // Post-state loosened (ADVICE r11): whether checkpointDir stays at
      // the scoped resolved dir or comes back unset after a failing
      // setCheckpointDir is a Spark implementation detail, not a
      // contract. The safety property is only that nothing escaped and
      // the session is in one of the two observable states.
      assert(sc.getCheckpointDir == scopedResolved
          || sc.getCheckpointDir.isEmpty,
        s"unexpected post-failure checkpoint dir: ${sc.getCheckpointDir}")
    } finally {
      sc.setCheckpointDir(null)
      java.nio.file.Files.deleteIfExists(blocker)
      graft.Staging.deleteRecursively(scoped)
    }
  }

  test("CheckpointScope.restore rethrows its failure when the scoped work " +
      "succeeded (no silent dangling dir)") {
    // With no primary exception in flight there is nothing to mask:
    // swallowing would leave the session silently pointed at a scoped
    // dir the caller may delete, with only a stderr line as evidence
    // (ADVICE r11). The failure must surface to the caller.
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "test precondition: shared session must start with no checkpoint dir")
    val scoped = java.nio.file.Files.createTempDirectory("graft_cp_scoped2")
    val blocker = java.nio.file.Files.createTempFile("graft_cp_blocker2", "")
    try {
      sc.setCheckpointDir(scoped.toString)
      val scopedResolved = sc.getCheckpointDir
      intercept[Exception] {
        graft.CheckpointScope.restore(sc, Some(s"$blocker/nested"))
      }
      assert(sc.getCheckpointDir == scopedResolved
          || sc.getCheckpointDir.isEmpty,
        s"unexpected post-failure checkpoint dir: ${sc.getCheckpointDir}")
    } finally {
      sc.setCheckpointDir(null)
      java.nio.file.Files.deleteIfExists(blocker)
      graft.Staging.deleteRecursively(scoped)
    }
  }

  test("connectedComponents releases the computed result's blocks when a " +
      "success-path restore failure discards it") {
    // restore() rethrows when the loop SUCCEEDED; the result frame —
    // deliberately left persisted for the caller — then never reaches a
    // caller, so its cached blocks would leak for the session's lifetime
    // (ADVICE r12). Forced by making the pre-CC session checkpoint dir
    // unrestorable: capture its resolved path, then replace that dir
    // with a plain FILE so restore's setCheckpointDir cannot mkdirs
    // under it.
    val sc = spark.sparkContext
    assert(sc.getCheckpointDir.isEmpty,
      "test precondition: shared session must start with no checkpoint dir")
    val userRoot = java.nio.file.Files.createTempDirectory("graft_cc_user_cp2")
    val ccDir = java.nio.file.Files.createTempDirectory("graft_cc_loop_cp2")
    try {
      for (algo <- Seq("minlabel", "star")) {
        sc.setCheckpointDir(userRoot.toString)
        val resolved = java.nio.file.Paths.get(
          new java.net.URI(sc.getCheckpointDir.get).getPath)
        java.nio.file.Files.delete(resolved)      // fresh uuid dir, empty
        java.nio.file.Files.createFile(resolved)  // now a plain file
        // start from a clean cache slate so the post-state assertions
        // are exact (recompute-on-use keeps this safe for other tests)
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
        intercept[Exception] {
          graft.ext.Dedup.connectedComponents(edges, "a", "b",
            checkpointDir = Some(ccDir.toString), algorithm = algo)
        }
        // the loop itself converged; the surfaced failure is the restore,
        // and the discarded result's blocks must have been released —
        // no persisted RDDs and no cached plans may remain
        assert(sc.getPersistentRDDs.isEmpty,
          s"$algo: discarded CC result leaked persisted RDD blocks: " +
            s"${sc.getPersistentRDDs.keySet}")
        assert(spark.sharedState.cacheManager.isEmpty,
          s"$algo: discarded CC result leaked a cached plan")
        java.nio.file.Files.delete(resolved)      // reset for next algo
        sc.setCheckpointDir(null)
      }
    } finally {
      sc.setCheckpointDir(null)
      graft.Staging.deleteRecursively(userRoot)
      graft.Staging.deleteRecursively(ccDir)
    }
  }

  test("asOfJoin hot-key split equals the single-window plan and buckets the window") {
    // key 1 holds 90% of rows — the scenario where the plain as-of join
    // funnels everything through one window task
    val left = spark.range(20000).select(
      when(col("id") % 10 < 9, 1L).otherwise(2L).as("k"),
      pmod(col("id") * 7, lit(100000)).as("t"),
      col("id").as("lv"))
    val right = spark.range(2000).select(
        when(col("id") % 10 < 9, 1L).otherwise(2L).as("k"),
        pmod(col("id") * 31, lit(100000)).as("t"),
        col("id").as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv")) // unique per (key, time)
    val plain = RelationalOps.asOfJoin(left, right, "k", "t")
      .select(col("lv"), col("asof.rv").as("rv"))
    val split = RelationalOps.asOfJoin(left, right, "k", "t", "asof",
      hotKeyThreshold = 1000L, hotKeyBuckets = 16)
      .select(col("lv"), col("asof.rv").as("rv"))
    // boundary stitch must be EXACT: identical matches row for row
    val p = plain.as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    val s = split.as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(p == s && p.nonEmpty)
    // and the running window actually partitions by (key, bucket)
    val planStr = split.queryExecution.executedPlan.toString
    assert(planStr.contains("__bucket"),
      s"window not bucket-partitioned:\n${planStr.take(2000)}")
  }

  test("asOfJoin armed-threshold fast path (no hot keys) equals the plain " +
    "plan and skips the bucket machinery") {
    // r21: when the threshold is armed but NO key exceeds it (the common
    // production case), the probe must fall back to the plain
    // single-window plan — identical rows, no __bucket column in the
    // executed plan, and the release thunk still owns the cached union
    val left = spark.range(5000).select(pmod(col("id"), lit(50)).as("k"),
      pmod(col("id") * 7, lit(100000)).as("t"), col("id").as("lv"))
    val right = spark.range(500).select(pmod(col("id"), lit(50)).as("k"),
        pmod(col("id") * 31, lit(100000)).as("t"), col("id").as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv"))
    val plain = RelationalOps.asOfJoin(left, right, "k", "t")
      .select(col("lv"), col("asof.rv").as("rv"))
    val before = spark.sparkContext.getPersistentRDDs.size
    // every key holds ~110 rows, far below the 100k threshold
    val (fast, release) = RelationalOps.asOfJoinWithRelease(left, right,
      "k", "t", "asof", hotKeyThreshold = 100000L, hotKeyBuckets = 16)
    val f = fast.select(col("lv"), col("asof.rv").as("rv"))
    val p = plain.as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    val s = f.as[(Long, Option[Long])].collect().sortBy(_._1).toSeq
    assert(p == s && p.nonEmpty)
    val planStr = f.queryExecution.executedPlan.toString
    assert(!planStr.contains("__bucket"),
      s"fast path did not skip the bucket machinery:\n${planStr.take(2000)}")
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "fast path did not persist the union — the release test is vacuous")
    release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "fast path's release() left cached blocks behind")
  }

  test("asOfJoinWithRelease: hot-key path's release drops its cached union") {
    // ADVICE r17: the hot path persists the tagged union for its five
    // consumers and the lazy result cannot release it in-method — library
    // callers get a release thunk (the connectedComponents convention)
    val left = spark.range(2000).select(lit(1L).as("k"),
      pmod(col("id") * 7, lit(9999)).as("t"), col("id").as("lv"))
    val right = spark.range(200).select(lit(1L).as("k"),
        pmod(col("id") * 31, lit(9999)).as("t"), col("id").as("rv"))
      .groupBy("k", "t").agg(max("rv").as("rv"))
    val before = spark.sparkContext.getPersistentRDDs.size
    val (out, release) = RelationalOps.asOfJoinWithRelease(left, right,
      "k", "t", "asof", hotKeyThreshold = 100L, hotKeyBuckets = 4)
    val n = out.count() // materialize BEFORE releasing (the contract)
    assert(n == 2000)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "hot path did not persist its union — the release test is vacuous")
    release()
    assert(spark.sparkContext.getPersistentRDDs.size == before,
      "release() left cached blocks behind")
    // default path: nothing persisted, release is a no-op
    val (out2, release2) = RelationalOps.asOfJoinWithRelease(left, right,
      "k", "t")
    assert(out2.count() == 2000)
    assert(spark.sparkContext.getPersistentRDDs.size == before)
    release2()
  }

  test("dictionary queries leave no persisted RDDs behind (zipWithRank lifecycle)") {
    // The round-3→5 leak: zipWithRank persisted its sorted RDD with no
    // owner, so every dictionary consumer accumulated cache blocks across
    // queries in a long-lived session. Now nothing is persisted — run the
    // dictionary-backed registered queries end-to-end and assert the
    // persistent-RDD map gained nothing.
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"$sf fixture not present")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Seq("q17_string_indexer", "q40_text_fingerprint", "q46_positional_join")
      .foreach { name =>
        QueryRegistry.queries(name)(spark, sf)
          .write.format("noop").mode("overwrite").save()
      }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"dictionary queries left persisted RDDs: $leaked")
    // and the direct operator path, with a shuffle-bearing lineage
    val dict = RelationalOps.frequencyIndex(
      Seq("x", "y", "y", "z", "z").toDF("v").repartition(3), "v")
    dict.write.format("noop").mode("overwrite").save()
    val leaked2 = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked2.isEmpty, s"frequencyIndex left persisted RDDs: $leaked2")
  }

  test("Tables.events normalizes ts across fixture generations (NTZ and TIMESTAMP(NANOS))") {
    // The round-14 breakage class: the driver regenerated the fixtures
    // with events.ts as naive TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ)
    // where earlier generations carried TIMESTAMP(NANOS) (read as long
    // under nanosAsLong), and the loader's unconditional nanos rebuild
    // failed analysis on 12 queries. Pin BOTH branches: whatever the
    // on-disk generation, the loader must yield TimestampType with
    // identical instant values.
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"$sf fixture not present")
    val native = Tables.events(spark, sf)
    assert(native.schema("ts").dataType == TimestampType,
      s"native load must normalize to TimestampType, got ${native.schema("ts").dataType}")
    // stage a legacy-generation copy with a REAL TIMESTAMP(NANOS) footer
    // via parquet-mr's low-level writer (Spark itself cannot produce
    // NANOS), so the genuine footer-decode path stays pinned — not the
    // plain-INT64 stand-in that skips it
    val legacyDir = TestSpark.tempDir("events_nanos_")
    val legacyFile = s"$legacyDir/events.parquet"
    val rows = native
      .select(col("event_id"), expr("unix_micros(ts) * 1000L"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .as[(Long, Long, Long, String, Double, String)].collect()
      .map { case (id, ns, uid, et, v, p) =>
        NanosEventsWriter.Row(id, ns, uid, et, v, p) }
    NanosEventsWriter.write(legacyFile, rows.toIndexedSeq)
    // the staged file must really carry the NANOS annotation: without the
    // legacy conf Spark refuses it outright (PARQUET_TYPE_ILLEGAL)...
    val strict = spark.newSession()
    strict.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    val err = intercept[Exception] {
      strict.read.parquet(legacyFile).collect()
    }.toString
    assert(err.toLowerCase.contains("illegal"),
      s"expected PARQUET_TYPE_ILLEGAL on a NANOS footer, got: $err")
    // ...and under it the footer reads as a plain long of epoch nanos
    assert(Tables.eventsRawSchema(spark, legacyDir.toString)("ts").dataType == LongType)
    val legacy = Tables.events(spark, legacyDir.toString)
    assert(legacy.schema("ts").dataType == TimestampType,
      s"legacy load must rebuild TimestampType, got ${legacy.schema("ts").dataType}")
    val nativeRows = native.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().sorted
    val legacyRows = legacy.select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().sorted
    assert(nativeRows.sameElements(legacyRows),
      "instant values must be identical across fixture generations")
  }

  test("Tables.events instants are independent of spark.sql.session.timeZone") {
    // The NTZ relabel used to be a bare cast("timestamp") — value-
    // preserving only under the engine-wide UTC session pin; an entry
    // point that forgot the pin would silently shift every instant by
    // the host offset. The make_timestamp(..., 'UTC') rebuild must give
    // identical instants under ANY session timezone (a separate session
    // keeps the tz override away from concurrently running suites).
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(sf).isDirectory, s"$sf fixture not present")
    val utcRows = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().sorted
    val la = spark.newSession()
    la.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    val laRows = Tables.events(la, sf)
      .select(col("event_id"), unix_micros(col("ts")))
      .as[(Long, Long)].collect().sorted
    assert(laRows.sameElements(utcRows),
      "NTZ rebuild shifted instants under a non-UTC session timezone")
  }
}
