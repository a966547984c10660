package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.RelationalOps

/** Deduplication operators for large-scale training-data pipelines:
  * exact (content-hash groupBy), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB posture):
  *  - exact dedup is a single hash shuffle on a 128-bit digest — never on
  *    the raw text (shuffle bytes = 16B/row + id);
  *  - shingling / hashing / signatures are row-local (explode + HOF, no
  *    shuffle until the band-bucket groupBy);
  *  - LSH candidate generation shuffles (band, bucket) keys only; bucket
  *    size is capped (`maxBucketSize`) so a degenerate bucket (all-equal
  *    docs, boilerplate) cannot produce a quadratic pair explosion;
  *  - the *oracle-parity* shingle-id path uses a sorted dictionary (exact
  *    cross-engine determinism); the *production* path keys shingles by
  *    `xxhash64`, which needs no global dictionary and no sort — switch
  *    with `useDictionaryIds=false`.
  */
object Dedup {

  val MinhashPrime = 2147483647L // 2^31 - 1

  /** Exact dedup: survivor = min(id) per content digest. One shuffle on a
    * 128-bit md5 (raw text stays at the mappers). */
  def exactByContent(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(md5(lower(col(textCol))).as("content_hash"), col(idCol))
      .groupBy("content_hash")
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_dups"))

  /** Distinct word n-gram shingles, row-local (split + HOF slide, no
    * shuffle — `array_distinct` dedupes within the row BEFORE the explode,
    * so (id, shingle) rows are already unique and no distinct shuffle is
    * needed). Output: (idCol, shingle). */
  def shingles(df: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    val toks = split(col(textCol), " ")
    df.select(col(idCol),
        explode(array_distinct(transform(
          sequence(lit(0), greatest(size(toks) - n, lit(0)) ),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))).as("shingle"))
      .filter(size(split(col("shingle"), " ")) === n)
  }

  /** Pairwise Jaccard over shingle sets: inverted-index self-join on the
    * shingle, count common, |A∪B| = |A|+|B|−common. A shingle shared by n
    * docs emits O(n²) join rows, so shingles with document frequency >
    * `maxDf` (stop-shingles: boilerplate headers, license blurbs) are
    * dropped from the join — the standard stop-shingle guard; set sizes
    * |A|,|B| stay the TRUE sizes so Jaccard is at worst underestimated for
    * pairs sharing only boilerplate. Use [[minhashCandidates]] when even
    * capped fan-out explodes.
    * Output: (id_a, id_b, common, n_a, n_b) with id_a < id_b. */
  def jaccardPairs(sh: DataFrame, idCol: String,
                   maxDf: Long = 1000L): DataFrame = {
    // The shingle frame fans out four ways (sizes, stop list, both join
    // sides): persist it once — unpersisted, the shingling lineage (at
    // 100 TB: the full corpus scan) re-runs per consumer.
    val s = RelationalOps.materialized(sh)
    val sizes = s.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    // The STOP list (df > maxDf) is tiny by construction — boilerplate
    // shingles are few in distinct count — so an anti join against it is
    // broadcast-eligible and the full shingle set is NOT re-shuffled
    // (a semi join on the huge keep-list would shuffle everything twice).
    val stop = s.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("shingle")
    val pruned = s.join(stop, Seq("shingle"), "left_anti")
    val a = pruned.select(col(idCol).as("id_a"), col("shingle"))
    val b = pruned.select(col(idCol).as("id_b"), col("shingle"))
    // SHUFFLE_HASH hint: post-explode size estimates are far below real
    // cardinality, so Catalyst would otherwise BROADCAST the whole b-side
    // shingle set (observed at sf0.1) — a driver OOM at scale. Hinting
    // forces a shuffled hash join partitioned by shingle; both sides are
    // identical subplans, so the exchange is reused.
    val out = RelationalOps.materialized(
      a.join(b.hint("shuffle_hash"), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
        .join(sizes.withColumnRenamed(idCol, "id_a")
          .withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
        .join(sizes.withColumnRenamed(idCol, "id_b")
          .withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
        .withColumn("jaccard",
          col("common").cast("double") /
            (col("n_a") + col("n_b") - col("common"))))
    s.unpersist()
    out
  }

  /** Shingle → integer id. Dictionary path: rank-by-sort (deterministic in
    * any engine → DuckDB-checkable), built with a distributed sort +
    * zipWithIndex ([[RelationalOps.zipWithRank]]) — NOT a no-partition
    * Window, which would funnel every distinct shingle through one task.
    * Production path: xxhash64 (row-local, no global sort; collisions
    * negligible at 2^-64). */
  def shingleIds(sh: DataFrame, useDictionaryIds: Boolean): DataFrame =
    if (useDictionaryIds) {
      val dict = RelationalOps.zipWithRank(
        sh.select("shingle").distinct(), Seq(col("shingle")), "sid")
      sh.join(dict, Seq("shingle"))
    } else sh.withColumn("sid", xxhash64(col("shingle")))

  /** MinHash signatures with `numHashes` affine hashes
    * h_i(x) = (a_i·x + b_i) mod p, banded `numHashes/rowsPerBand` ways.
    * a_i/b_i derive from i by a fixed formula (no RNG → reproducible and
    * oracle-replicable).
    *
    * Plan shape: the hash parameters are compile-time constants, so all
    * `numHashes` minima are computed as columns of ONE hash aggregation —
    * a single shuffle of |shIds| rows with map-side partial mins. (The
    * alternative — crossJoin with a hash-params table then groupBy
    * (id, i) — multiplies the shuffle by numHashes.) Bands are then cut
    * from the signature columns row-locally.
    * Output: (id, band, bucket) — one row per doc per band; `bucket` is
    * the joined band-signature string. */
  def minhashBuckets(shIds: DataFrame, idCol: String, numHashes: Int,
                     rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand " +
        s"($rowsPerBand) — a partial band would silently drop hashes")
    val mins = (0 until numHashes).map { i =>
      val a = (i + 1) * 387420489L % MinhashPrime
      val b = ((i + 1) * 1299709L + 104729L) % MinhashPrime
      // reduce sid into [0, p) FIRST: xxhash64 ids (production path) span
      // the full signed-64 range and sid·a would overflow long (ANSI mode
      // throws). For dictionary ids (< p always) pmod is the identity, so
      // the oracle-checked values are unchanged.
      min((pmod(col("sid"), lit(MinhashPrime)) * a + b) % MinhashPrime)
        .as(s"mh_$i")
    }
    val sig = shIds.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    val bands = (0 until numHashes / rowsPerBand).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
          .map(i => col(s"mh_$i").cast("string")): _*).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** LSH candidate pairs: docs sharing any (band, bucket). Buckets larger
    * than `maxBucketSize` are dropped (boilerplate guard — at 100 TB a
    * single all-identical-header bucket would otherwise emit O(n²) pairs).
    *
    * Deliberate shape: count-filter-then-self-join, NOT
    * `collect_list`-per-bucket with row-local pair explosion. The latter
    * would halve the lineage passes but materializes an entire bucket in
    * one aggregation buffer BEFORE any size filter can apply — an
    * executor OOM on exactly the degenerate buckets the cap exists for.
    * The (id, band, bucket) frame is bounded (one row per doc per band)
    * and spillable, so it is persisted once and every consumer — the size
    * count and both self-join sides — scans the cache: the expensive
    * lineage above it (shingles → dictionary → signature aggregation)
    * runs exactly once, not once per consumer. */
  def minhashCandidates(buckets: DataFrame, idCol: String,
                        maxBucketSize: Int = 1000): DataFrame = {
    val bk = RelationalOps.materialized(buckets)
    val sized = bk.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucketSize && col("bsz") > 1)
    val b = bk.join(sized.select("band", "bucket"), Seq("band", "bucket"))
    val out = RelationalOps.materialized(
      b.select(col("band"), col("bucket"), col(idCol).as("id_a"))
        .join(b.select(col("band"), col("bucket"), col(idCol).as("id_b"))
          .hint("shuffle_hash"), // post-explode estimates undercount: no broadcast
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct())
    bk.unpersist()
    out
  }

  /** 16-bit SimHash from per-doc distinct token ids: bit b of token t is
    * bit b of (t·2654435761); the signature bit is the sign of the summed
    * ±1 votes. Everything is integer arithmetic → engine-agnostic. */
  def simhash(tokIds: DataFrame, idCol: String, bits: Int = 16): DataFrame = {
    val votes = tokIds
      .crossJoin(broadcast(tokIds.sparkSession.range(bits)
        .select(col("id").cast("int").as("b"))))
      .withColumn("vote",
        when(expr("((sid * 2654435761) >> b) & 1") === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("vote")).as("v"))
    votes.withColumn("bit", when(col("v") > 0, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(sum(expr("bit << b")).as("simhash"))
  }

  /** Pairs within `maxHamming` of each other, via exact pigeonhole
    * banding: split the `bits`-bit signature into `maxHamming + 1`
    * segments — a pair with ≤ maxHamming differing bits MUST agree exactly
    * on at least one segment, so joining on (segment, value) loses no
    * pair (recall = 1, results identical to the all-pairs crossJoin) while
    * the shuffle carries only (segment, value, id, sig) keys and the join
    * fan-out is per-segment-bucket, not O(n²). */
  def simhashPairs(sh: DataFrame, idCol: String, maxHamming: Int,
                   bits: Int = 16): DataFrame = {
    val nSeg = maxHamming + 1
    val segVals = array((0 until nSeg).map { s =>
      val lo = s * bits / nSeg
      val w  = (s + 1) * bits / nSeg - lo
      shiftright(col("simhash"), lo).bitwiseAND(lit((1L << w) - 1))
    }: _*)
    // persist the segmented frame: both self-join sides consume it, and
    // its lineage (tokens → dictionary → signature) must run once, not twice
    val banded = RelationalOps.materialized(
      sh.select(col(idCol), col("simhash"),
        posexplode(segVals).as(Seq("seg", "segval"))))
    val a = banded.select(col("seg"), col("segval"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("seg"), col("segval"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    val out = RelationalOps.materialized(
      a.join(b.hint("shuffle_hash"), // post-explode estimates undercount: no broadcast
          Seq("seg", "segval"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b").distinct()
        .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)"))
        .filter(col("hamming") <= maxHamming)
        .select("id_a", "id_b", "hamming"))
    banded.unpersist()
    out
  }

  /** Connected components over an undirected edge list — the clustering
    * step every dedup pipeline needs AFTER candidate pairs: pairs
    * (a,b),(b,c) must collapse into one cluster {a,b,c} with a single
    * canonical survivor, or the "dedup" keeps transitive duplicates.
    *
    * Iterative min-label propagation: every node starts labeled with its
    * own id; each round takes the min of its neighbors' labels; fixpoint
    * = components labeled by their min member. Each round is one
    * shuffle-join + one aggregation. Lineage is truncated per round by
    * rebuilding the label frame from an explicitly persisted row RDD
    * (`LogicalRDD` boundary) — without truncation the plan tree doubles
    * every iteration and Catalyst re-derives the whole chain (the
    * classic iterative-algorithm trap). Owning the RDD handle (instead
    * of `localCheckpoint`, whose storage is only freed when the GC
    * collects the RDD) lets each round unpersist the previous round's
    * blocks eagerly, so at most two label tables are ever materialized;
    * the RETURNED frame stays persisted for the caller. At cluster
    * scale use reliable `checkpoint` to also survive executor loss.
    * Converges in O(diameter) rounds — near-duplicate clusters are
    * star/clique shaped (diameter ≤ ~3), so 3–4 rounds in practice; for
    * adversarial long-path graphs use the large-star/small-star variant
    * (O(log n) rounds).
    *
    * Returns (id, label) for every node that appears in an edge. */
  def connectedComponents(edges: DataFrame, a: String, b: String,
                          maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val sym = RelationalOps.materialized(
      edges.select(col(a).as("src"), col(b).as("dst"))
        .union(edges.select(col(b).as("src"), col(a).as("dst")))
        .distinct())
    // persist + rebuild from the RDD: truncates lineage like
    // localCheckpoint but keeps the storage handle so it can be freed
    def truncate(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
      val r = df.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (spark.createDataFrame(r, df.schema), r)
    }
    var (labels, labelsRdd) = truncate(
      sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("nbr"))
      // ONE action per round: the step frame carries a per-row "label
      // shrank" flag, and the same job that materializes the next label
      // table tallies the flags through an accumulator — no separate
      // convergence probe (which used to cost a second pass over the
      // labels each round). A task retry can only over-count the
      // accumulator, so a spurious non-zero costs at most one extra
      // round; a zero is exact, so convergence is never declared early.
      val stepped = labels
        .join(nbrMin, col("id") === col("dst"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nbr"),
          col("label"))).as("label"),
          (coalesce(col("nbr"), col("label")) < col("label"))
            .as("__changed"))
      val acc = spark.sparkContext.longAccumulator(s"cc_changed_$iter")
      val nextRdd = stepped.rdd.map { row =>
        if (row.getBoolean(2)) acc.add(1L)
        org.apache.spark.sql.Row(row.get(0), row.get(1))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      nextRdd.count()
      converged = acc.value == 0L
      labelsRdd.unpersist(blocking = false)
      labels = spark.createDataFrame(nextRdd, labels.schema)
      labelsRdd = nextRdd
      iter += 1
    }
    sym.unpersist()
    // a silent non-converged return would hand back WRONG cluster labels
    // (some nodes still carrying a non-minimal component id) — fail loudly
    // instead; real dup graphs converge in a handful of rounds, so hitting
    // this means the graph has a pathological long path (raise maxIter or
    // switch to the large-star/small-star O(log n) variant)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds")
    labels
  }
}
