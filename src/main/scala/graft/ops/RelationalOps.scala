package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** The reference's relational operator surface, re-expressed as reusable
  * Spark-native combinators (SURVEY.md §2.2–§2.5). Everything is
  * declarative DataFrame API so Catalyst keeps pushdown / pruning /
  * join-strategy freedom; nothing collects to the driver except bounded
  * scalar aggregates that feed broadcast joins.
  */
object RelationalOps {

  /** Persist `df` (MEMORY_AND_DISK — bounded memory, spills, never OOMs)
    * and materialize it with one count job, so every later consumer scans
    * the cache instead of re-running the lineage. The tool for operators
    * whose shared intermediate (shingle / bucket / banded frame) fans out
    * into a sized-filter + self-join: without it the lineage above the
    * fan-out runs once PER consumer — at 100 TB that is re-reading the
    * corpus ~4×. Callers own the returned handle and must `unpersist()`
    * it once their own output is materialized. */
  def materialized(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** [[materialized]] that respects a cache the CALLER already holds on
    * `df`: if the frame is persisted, reuse it and return a no-op
    * release; otherwise persist it and return a release that drops
    * ONLY the blocks this call created. For helpers that fan a
    * caller-supplied frame into several consumers — an unconditional
    * persist/unpersist pair would silently drop the caller's own cache
    * on the way out (persist state lives on the shared plan, not a
    * private copy). */
  def borrowMaterialized(df: DataFrame): (DataFrame, () => Unit) =
    if (df.storageLevel != StorageLevel.NONE) (df, () => ())
    else {
      val p = materialized(df)
      (p, () => { p.unpersist(); () })
    }

  /** J1 — "trim low-importance elements", the reference's most distinctive
    * relational op (reference `PySpark Scripts/bgrfunctions.py:43-53`):
    * keep fact rows whose `keyA` group has > minA rows AND whose `keyB`
    * group has > minB rows. Single pass (not a fixpoint), exactly like the
    * reference.
    *
    * Scale: the two aggregated sides carry one row per distinct key —
    * usually orders of magnitude smaller than the fact — so AQE picks a
    * broadcast-hash semi join from runtime stats while they fit (fact
    * streams map-side, no fact shuffle), and falls back to a shuffled
    * semi join when a dictionary outgrows the broadcast limit — a slower
    * plan, never a driver OOM.
    */
  def trimLowImportance(fact: DataFrame, keyA: String, minA: Long,
                        keyB: String, minB: Long): DataFrame = {
    val popularA = fact.groupBy(keyA).count().filter(col("count") > minA)
    val popularB = fact.groupBy(keyB).count().filter(col("count") > minB)
    // No forced broadcast: the aggregated sides are usually tiny, but at
    // 100× the distinct-key dictionaries can exceed the broadcast limit —
    // AQE picks broadcast-hash from runtime stats when they fit, and falls
    // back to a shuffled semi join (instead of a driver OOM) when not.
    fact
      .join(popularA.select(keyA), Seq(keyA), "left_semi")
      .join(popularB.select(keyB), Seq(keyB), "left_semi")
  }

  /** Deterministic dense rank ids for (already-distinct) rows of `df` in
    * `sortCols` order, WITHOUT a no-partition `Window.orderBy` (which
    * funnels every row through a single task — a scale-killer for
    * shingle/token dictionaries). Here the sort is a distributed
    * range-partitioned sort and ids come from `zipWithIndex` (per-partition
    * offsets, one extra size-collect job); ids are identical to
    * `row_number() OVER (ORDER BY sortCols)` + (startAt−1) because the
    * global order is the sort order regardless of partition boundaries.
    *
    * `sortCols` must be a TOTAL order over `df`'s rows (all call sites
    * rank distinct keys, or break frequency ties by the key) — required
    * for the ids to be well-defined at all, and it is also what makes the
    * no-cache lifecycle below deterministic across re-executions.
    *
    * Lifecycle (the round-3→5 leak, fixed): nothing is persisted.
    * `zipWithIndex` launches its per-partition size job over the parent
    * before the mapped RDD is ever consumed; that job computes the full
    * lineage once and registers every shuffle's map outputs with the
    * MapOutputTracker. Because later consumers run over the SAME RDD
    * object (same shuffle dependencies), the DAGScheduler skips the
    * already-computed map stages — the corpus scan / distinct shuffle
    * above the dictionary never re-runs; only the reduce-side
    * per-partition sort of the (much smaller, post-distinct) dictionary
    * is recomputed per consumer. Bounded re-work instead of unbounded
    * cache-block accumulation across queries in a long-lived session. */
  def zipWithRank(df: DataFrame, sortCols: Seq[Column], out: String,
                  startAt: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(sortCols: _*)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val sortedRdd = sorted.rdd
    val rows = sortedRdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + startAt))
    }
    spark.createDataFrame(rows, schema)
  }

  /** P8 — CASE WHEN discretization (reference `bgrfunctions.py:22-24`:
    * `when(Rating < 4, 0.0).otherwise(1.0)`). */
  def discretize(df: DataFrame, c: String, threshold: Double,
                 out: String): DataFrame =
    df.withColumn(out, when(col(c) < threshold, 0.0).otherwise(1.0))

  /** A6 + P7 — IQR outlier fences (reference `bgrfunctions.py:369-393`):
    * per column, Q1/Q3 via *exact* percentile, IQR = Q3−Q1, keep rows in
    * (Q1−IQR, Q3+IQR). The reference computes fences driver-side in
    * pandas; here they stay in the plan as a 1-row aggregate cross-joined
    * (broadcast) into the filter, so the fact table streams once.
    *
    * Scale note: EXACT percentile is the reference's semantic (pandas
    * `quantile`) and is what the oracle checks, but its aggregation
    * buffers distinct values — memory grows with distinct-value count,
    * not a bounded sketch. That is fine for the bounded-cardinality
    * columns this op targets (sizes, prices); for a continuous column
    * with billions of distinct values use the `percentile_approx`
    * fences (the q66/q59 approx family, same fence arithmetic) — the
    * fact-side plan shape is identical, only the 1-row aggregate
    * changes. */
  def removeOutliersIqr(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(percentile(col(c), lit(0.25)).as(s"${c}_q1"),
          percentile(col(c), lit(0.75)).as(s"${c}_q3"))
    }
    val fences = df.agg(aggs.head, aggs.tail: _*)
    val withFences = df.crossJoin(broadcast(fences))
    val keep = cols.map { c =>
      val iqr = col(s"${c}_q3") - col(s"${c}_q1")
      val lo  = col(s"${c}_q1") - iqr
      val hi  = col(s"${c}_q3") + iqr
      // degenerate fence (IQR = 0, constant-ish column): strict bounds
      // would drop every row, so the fence becomes inclusive — the
      // reference's own >=/<= variant (`bgrfunctions.py:384-387`)
      when(iqr === 0, col(c) >= lo && col(c) <= hi)
        .otherwise(col(c) > lo && col(c) < hi)
    }.reduce(_ && _)
    withFences.filter(keep).drop(cols.flatMap(c =>
      Seq(s"${c}_q1", s"${c}_q3")): _*)
  }

  /** A11 — min-max scaling of one column to [0,1], relational analog of
    * `ml.feature.MinMaxScaler` (reference `fmreg.py:35-37`). The 1-row
    * min/max aggregate is broadcast; no shuffle of the fact side. A
    * constant (or single-row) column maps to 0.5 — Spark ML
    * MinMaxScaler's own degenerate-range semantic — instead of a
    * divide-by-zero (an ANSI-mode ArithmeticException for integral
    * columns, NaN for doubles). */
  def minMaxScale(df: DataFrame, c: String, out: String): DataFrame = {
    val mm = df.agg(min(col(c)).as("__mn"), max(col(c)).as("__mx"))
    df.crossJoin(broadcast(mm))
      .withColumn(out,
        when(col("__mx") === col("__mn"), lit(0.5))
          .otherwise((col(c) - col("__mn")) /
            (col("__mx") - col("__mn"))))
      .drop("__mn", "__mx")
  }

  /** A7/P17 — mode with deterministic tie-break (smallest value wins),
    * reference `bgrfunctions.py:27-32` (pandas groupby→size→sort→first).
    * One hash aggregation + a 1-row sort — scale-safe. */
  def modeOf(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).count()
      .orderBy(col("count").desc, col(c).asc)
      .limit(1)

  /** M1 relational analog — frequency-ranked dictionary like StringIndexer
    * (reference `bgrfunctions.py:151-160`): most frequent value → index 0;
    * ties broken by value ascending (deterministic, unlike raw
    * StringIndexer). Ranked via [[zipWithRank]] — no single-partition
    * Window even when the dictionary is large. */
  def frequencyIndex(df: DataFrame, c: String): DataFrame =
    zipWithRank(df.groupBy(col(c)).agg(count(lit(1)).as("cnt")),
      Seq(col("cnt").desc, col(c).asc), "idx", startAt = 0L)

  /** Skew-safe equi join: when one fact key holds a disproportionate
    * share of rows, a plain hash join sends the whole hot key to one
    * task. Salting splits every fact key into `salts` sub-keys and
    * replicates each dim row `salts` ways, so the hot key spreads over
    * `salts` tasks. Result is identical to the plain inner equi join.
    * AQE's skew-join handles sort-merge skew automatically; explicit
    * salting remains the tool for broadcast-ineligible hash joins and
    * for aggregations.
    *
    * The salt is a hash of the ROW CONTENT, never of a
    * nondeterministic id: monotonically_increasing_id re-enumerates
    * differently when a lost map task is recomputed, so a partial
    * stage retry would route the re-hashed rows to different reducers
    * than the surviving shuffle outputs — silently duplicating or
    * dropping fact rows (the SPARK-23207 class, invisible in
    * single-attempt runs and live exactly at the cluster scale the
    * salt guard exists for). Identical rows sharing a salt is fine
    * for CORRECTNESS — the salt only balances, it never changes the
    * join result — but it is a balancing limitation: a hot key whose
    * rows are exact duplicates (plausible in a pre-dedup corpus) all
    * land on ONE salt, i.e. one task, exactly as if unsalted. Such
    * keys need exact dedup (or a count pre-aggregation) first; no
    * content-derived salt can split indistinguishable rows without
    * reintroducing the retry-nondeterminism above.
    *
    * Unhashable column types (MapType, nested or top-level) are
    * excluded from the salt hash — xxhash64 rejects them with an
    * AnalysisException. The remaining columns still balance; in the
    * degenerate all-map-schema case the salt is constant (balancing
    * off, result still correct). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => hashable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          hashable(a.elementType)
        case _ => true
      }
    val hashCols = fact.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name)).toIndexedSeq
    val saltBase =
      if (hashCols.nonEmpty) xxhash64(hashCols: _*) else lit(0L)
    val saltedFact = fact.withColumn("__salt",
      pmod(saltBase, lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Band (interval) join with NO equi key: pair every left row with the
    * right rows whose time lies in `[leftTime - delta, leftTime]` (both
    * ends inclusive). Time columns are epoch-seconds longs (any monotone
    * integer clock works); the two inputs must have disjoint column
    * names. The naive formulation is a crossJoin + range filter —
    * O(n·m) compares, the canonical scale-killer. Shape here: bucket
    * both sides by `time div delta`; a right row in bucket b can only
    * match left rows in buckets {b, b+1}, so the left side is exploded
    * to its own bucket and the one below (fixed 2× replication — NOT
    * data-dependent), equi-joined on the bucket, then exact-filtered.
    * One shuffle on the bucket key, matching cost O(output + n + m).
    * Pair count grows with time density × delta — that is intrinsic to
    * the semantics, not the plan. A pathologically hot Δ-window makes a
    * hot bucket; shrink delta (finer buckets, same answer) or let AQE
    * skew-split handle it. */
  def bandJoin(left: DataFrame, right: DataFrame, leftTime: String,
               rightTime: String, delta: Long): DataFrame = {
    require(delta > 0, "bandJoin: delta must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "bandJoin: inputs must have disjoint column names")
    // `div` = integral division (no double rounding at epoch magnitudes)
    val lb = left.withColumn("__bucket",
      explode(array(expr(s"$leftTime div $delta"),
        expr(s"$leftTime div $delta") - 1)))
    val rb = right.withColumn("__rbucket", expr(s"$rightTime div $delta"))
    lb.join(rb, col("__bucket") === col("__rbucket") &&
        col(rightTime) >= col(leftTime) - delta &&
        col(rightTime) <= col(leftTime))
      .drop("__bucket", "__rbucket")
  }

  /** As-of join: attach to every left row the single latest right row of
    * the same `key` with right.`time` <= left.`time` (ties at equal time
    * match, like DuckDB/kdb ASOF semantics); left rows with no prior
    * right row get a null match (left-outer). Spark has no native as-of
    * join and the naive formulations are scale-killers (range-predicate
    * theta join → O(n·m) per key; per-left-row subquery → one window sort
    * per probe).
    *
    * Shape here: tag both inputs, UNION them, and run ONE running
    * `last(right_payload, ignoreNulls)` window per key ordered by
    * (time, side) with right rows sorting before left rows at equal
    * times. Single shuffle on `key`, running frame is computed
    * incrementally (no per-row re-scan), memory is one carried struct per
    * partition stream. A pathologically hot key funnels to one task, the
    * generic window-skew caveat — pre-split such keys by time range and
    * stitch the boundary row if that ever dominates.
    *
    * The right side should be unique per (key, time) — pre-aggregate to
    * pick the semantically meaningful row. If it is not unique, the
    * winner among equal-(key, time) right rows is still DETERMINISTIC
    * (the window order carries an xxhash64 of the right payload as the
    * final tie-break, so reruns and repartitionings agree), just not
    * semantically chosen.
    *
    * Hot-key mitigation: a key holding a disproportionate share of rows
    * funnels its whole stream through one window task — the generic
    * window-skew hazard. With `hotKeyThreshold` set, keys whose row
    * count exceeds it are pre-split into `hotKeyBuckets` contiguous
    * TIME RANGES (per-key approx-quantile split points, so the ranges
    * are balanced); the running window then partitions by (key, bucket)
    * and a per-bucket carry-in — the last right row of all earlier
    * buckets, computed on a tiny (hot-keys × buckets) frame — stitches
    * the boundary, so results are identical to the single-window plan.
    * Bucket assignment is monotone in time (same time ⇒ same bucket),
    * which is what makes the stitch exact; the split points themselves
    * may vary run-to-run (approx sketch), but the OUTPUT is invariant
    * to where the cuts land. Costs two extra narrow passes over the
    * union (per-key counts + hot-key quantiles), both map-side-combined
    * — the default threshold disables the machinery entirely.
    *
    * Cache lifecycle on the hot-key path: the union of both inputs is
    * persisted (it fans into five consumers) and stays persisted for the
    * LAZY result's consumers — this method cannot release it. Harness
    * callers are covered (Verify/Bench clear caches between queries);
    * long-lived library callers on the hot-key path should use
    * [[asOfJoinWithRelease]] and call the release thunk once their own
    * output is materialized, else one cached union of both inputs leaks
    * per call (the connectedComponents release-thunk convention). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               time: String, out: String = "asof",
               hotKeyThreshold: Long = Long.MaxValue,
               hotKeyBuckets: Int = 16): DataFrame =
    asOfJoinWithRelease(left, right, key, time, out, hotKeyThreshold,
      hotKeyBuckets)._1

  /** [[asOfJoin]] returning a release thunk alongside the result: a no-op
    * on the default single-window path (nothing is persisted there); on
    * the hot-key path it drops the cached union this call created. Call
    * it only AFTER materializing the result — the result plan reads the
    * cache. */
  def asOfJoinWithRelease(left: DataFrame, right: DataFrame, key: String,
               time: String, out: String = "asof",
               hotKeyThreshold: Long = Long.MaxValue,
               hotKeyBuckets: Int = 16): (DataFrame, () => Unit) = {
    import org.apache.spark.sql.types.StructType
    val rFields = right.schema.fields.filterNot(_.name == key)
    val lType = StructType(left.schema.fields)
    val rType = StructType(rFields)
    val lPart = left.select(col(key), col(time).as("__t"),
      lit(1).as("__side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rPart = right.select(col(key), col(time).as("__t"),
      lit(0).as("__side"),
      lit(null).cast(lType).as("__l"),
      struct(rFields.map(f => col(f.name)).toIndexedSeq: _*).as("__r"))
    val unioned = lPart.unionByName(rPart)
    if (hotKeyThreshold == Long.MaxValue) {
      val w = Window.partitionBy(col(key))
        .orderBy(col("__t"), col("__side"), xxhash64(col("__r")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      (unioned
        .withColumn(out, last(col("__r"), ignoreNulls = true).over(w))
        .filter(col("__side") === 1)
        .select(col("__l.*"), col(out)), () => ())
    } else {
      require(hotKeyBuckets > 1,
        "asOfJoin: hotKeyBuckets must be > 1 when hot-key splitting is on")
      // The union of both inputs fans into FIVE consumers on this path
      // (hot-key count, split-point collect, and — through withB — the
      // window, per-bucket-last, and spine subtrees). Unpersisted, the
      // full left+right lineage re-runs per consumer (~5 corpus scans
      // at scale); persisted, it runs once and the consumers scan the
      // cache. Left persisted for the result's consumers — the result
      // is lazy, so the blocks cannot be released inside this function;
      // ownership goes to the returned release thunk (see scaladoc).
      val unionedM = materialized(unioned)
      // hot keys are few by definition (each holds > threshold rows), so
      // both the hot-key list and the per-key split points broadcast
      val hot = unionedM.groupBy(col(key)).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > hotKeyThreshold).select(col(key))
      // ADAPTIVE FAST PATH (r21): when NO key exceeds the threshold the
      // bucket machinery is an exact no-op — every row gets __splits =
      // null → bucket 0, the (key, 0) window IS the (key) window, and
      // the carry join coalesces against null — so probe the hot list
      // first (one map-side-combined count over the cache, the same
      // aggregation the slow path needs anyway) and run the plain
      // single-window plan over the cached union instead, skipping the
      // split-point collect, broadcast join, per-bucket-last, spine and
      // carry stages entirely. The armed-threshold-but-no-hot-keys case
      // is the COMMON one (the guard exists for the tail risk); with
      // hot keys present the machinery below is unchanged.
      if (hot.isEmpty) {
        val w = Window.partitionBy(col(key))
          .orderBy(col("__t"), col("__side"), xxhash64(col("__r")))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        return (unionedM
          .withColumn(out, last(col("__r"), ignoreNulls = true).over(w))
          .filter(col("__side") === 1)
          .select(col("__l.*"), col(out)),
          () => { unionedM.unpersist(); () })
      }
      val probs = array((1 until hotKeyBuckets)
        .map(i => lit(i.toDouble / hotKeyBuckets)): _*)
      // The split points are COLLECTED once and re-broadcast as a literal
      // local relation, for correctness, not convenience: the bucketed
      // frame feeds three subtrees (window, per-bucket-last, spine), and
      // approx-quantile results can vary with partial-merge order across
      // re-executions — branches disagreeing on a boundary would mis-
      // stitch a carry row. The collect is self-bounding: every hot key
      // holds > hotKeyThreshold rows, so there are at most
      // total/hotKeyThreshold rows here, independent of data scale.
      val splitRows = unionedM.join(broadcast(hot), Seq(key), "left_semi")
        .groupBy(col(key))
        .agg(percentile_approx(col("__t").cast("double"), probs,
          lit(10000)).as("__splits"))
        .collect()
      val splitSchema = org.apache.spark.sql.types.StructType(Seq(
        unionedM.schema(key),
        org.apache.spark.sql.types.StructField("__splits",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))
      val splits = unionedM.sparkSession.createDataFrame(
        java.util.Arrays.asList(splitRows: _*), splitSchema)
      // bucket = number of split points <= t: monotone in t, so every
      // bucket is a contiguous time range and equal times share a bucket
      val withB = unionedM.join(broadcast(splits), Seq(key), "left")
        .withColumn("__bucket",
          when(col("__splits").isNull, lit(0)).otherwise(
            size(filter(col("__splits"),
              s => s <= col("__t").cast("double")))))
        .drop("__splits")
      val wB = Window.partitionBy(col(key), col("__bucket"))
        .orderBy(col("__t"), col("__side"), xxhash64(col("__r")))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val windowed = withB.withColumn("__run",
        last(col("__r"), ignoreNulls = true).over(wB))
      // carry-in per (key, bucket): the winning right row of each bucket
      // (same (t, hash) order as the window), prefix-propagated across
      // buckets on a frame of at most (#keys × buckets) rows — the
      // window below is over ≤ hotKeyBuckets rows per key, never data
      val lastPerBucket = withB.filter(col("__side") === 0)
        .groupBy(col(key), col("__bucket"))
        .agg(max_by(col("__r"),
          struct(col("__t"), xxhash64(col("__r")))).as("__last_r"))
      val spine = withB.select(col(key), col("__bucket")).distinct()
      val wCarry = Window.partitionBy(col(key)).orderBy(col("__bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = spine
        .join(lastPerBucket, Seq(key, "__bucket"), "left")
        .withColumn("__carry",
          last(col("__last_r"), ignoreNulls = true).over(wCarry))
        .select(col(key), col("__bucket"), col("__carry"))
      (windowed.join(carry, Seq(key, "__bucket"), "left")
        .withColumn(out, coalesce(col("__run"), col("__carry")))
        .filter(col("__side") === 1)
        .select(col("__l.*"), col(out)),
        () => { unionedM.unpersist(); () })
    }
  }

  /** W4 — grouped top-k via ranked window; Spark 4's WindowGroupLimit rule
    * pushes the `rn <= k` predicate into the window exec, so only k rows
    * per group survive the shuffle (no full per-group sort materialized).
    * Relational analog of `recommendForAllUsers(10)`
    * (reference `als.py:44-47`). */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(part: _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }

  /** Morton (z-order) key: bit-interleave of two pre-quantized ranks in
    * [0, 2^bits). The multi-dimensional layout lever next to q70's 1-D
    * range clustering: files clustered on the z-key bound BOTH source
    * dimensions per file, so parquet footer min/max stats prune scans for
    * predicates on EITHER column — at 100 TB the difference between
    * "filter on the sort key prunes, anything else reads everything" and
    * two-sided pruning. Built as a static 2·bits-term expression tree of
    * shift/and/or Column ops — whole-stage-codegen'd, no UDF, no HOF.
    * (the standard construction open-source lakehouse table formats
    * apply for multi-column OPTIMIZE / cluster-by). */
  def zOrderKey(rx: Column, ry: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(rx, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ry, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }

  /** Driver-free equal-width quantization of `c` into [0, 2^bits):
    * `lo`/`hi` are columns (from a broadcast 1-row min/max aggregate, not
    * a collect). `floor` over the double quotient is exact while the
    * numerator `(c−lo)·(2^bits−1)` stays under 2^53 — holds for any
    * 32-bit-range column at bits ≤ 20, asserted nowhere because the
    * oracle compare would catch a violation as a value mismatch.
    * Equal-WIDTH (not equal-frequency): rank boundaries depend only on
    * [min, max], so no global sort / quantile pass over 100 TB is
    * needed; heavy value skew concentrates ranks, which z-order
    * tolerates (skewed cells simply span more files). */
  def equalWidthRank(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val levels = (1L << bits) - 1
    floor(((c - lo) * lit(levels)) / greatest(hi - lo, lit(1L))).cast(LongType)
  }
}
