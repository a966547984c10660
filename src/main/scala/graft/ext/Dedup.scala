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

  /** Paragraph stream for SUB-document dedup (VERDICT r19 #3): whole-doc
    * dedup misses the dominant boilerplate class in real corpora —
    * repeated paragraphs inside otherwise-unique documents. The fixture
    * corpus carries no explicit paragraph separators, so "paragraph" =
    * non-overlapping `paraLen`-token block ([[TextAnalysis.chunk]] with
    * stride == chunkLen — same slicing arithmetic q98 pins against the
    * oracle at every legal combo); a corpus with real separators would
    * swap the splitter, not this pipeline. Row-local (HOF slice + md5,
    * zero shuffle): only the 16-byte digests ever leave the mappers —
    * the q30 scale posture, now per paragraph.
    * Output: (idCol, para_id, para_hash). */
  def paragraphHashes(df: DataFrame, idCol: String, textCol: String,
                      paraLen: Int): DataFrame =
    TextAnalysis.chunk(df, idCol, textCol,
        chunkLen = paraLen, stride = paraLen)
      .select(col(idCol), col("chunk_id").as("para_id"),
        md5(col("chunk_text")).as("para_hash"))

  /** Distinct word n-gram shingles, row-local (split + HOF slide, no
    * shuffle — `array_distinct` dedupes within the row BEFORE the explode,
    * so (id, shingle) rows are already unique and no distinct shuffle is
    * needed). Output: (idCol, shingle). */
  def shingles(df0: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    val df = graft.Tables.spreadSmallScan(df0)
    val toks = split(col(textCol), " ")
    // docs shorter than n tokens emit NO start positions, so the sub-n
    // stub the old post-explode filter removed is never constructed —
    // that filter RE-SPLIT every emitted shingle string to count its
    // tokens, a second O(len) string pass per shingle that profiled at
    // a third of the whole shingling stage (guide §1: the only rows it
    // could ever drop are the one-per-short-doc stubs, exactly what the
    // guarded sequence excludes). For size >= n every slice is exactly
    // n tokens by construction, so output is identical.
    val starts = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol),
        explode(array_distinct(transform(starts,
          i => array_join(slice(toks, i + 1, lit(n)), " ")))).as("shingle"))
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
    // 100 TB: the full corpus scan) re-runs per consumer. Borrowed, not
    // taken: if the CALLER already persisted sh (to reuse it across
    // several dedup passes), their cache is reused and left intact —
    // an unconditional persist/unpersist here would silently drop it.
    val (s, releaseS) = RelationalOps.borrowMaterialized(sh)
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
    releaseS()
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

  /** splitmix64 finalizer — the standard 64-bit avalanche mixer. Used to
    * derive minhash parameters that are actually independent across i. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Parameters of the i-th minhash h_i(x) = (a_i·x + b_i) mod p:
    * a_i ∈ [1, p−1], b_i ∈ [0, p−1], both splitmix64-mixed from i — a
    * fixed pure function of i (no RNG state → reproducible everywhere,
    * and the DuckDB oracles embed the same values as literals).
    *
    * Why mixed and not a linear ramp: the original family used
    * a_i = (i+1)·c, b_i = (i+1)·d + e, which factors as
    * h_i(x) = (i+1)·g(x) + e mod p with g(x) = c·x + d. Any shingle
    * whose g(x) lands below p/numHashes then minimizes EVERY h_i
    * simultaneously (no mod wraparound to break the order), and a doc
    * with ≥ numHashes shingles almost surely has one — so the whole
    * signature collapsed to effectively ONE independent hash. Recall
    * then depended on whether the few differing shingles of a near-dup
    * pair contained the g-minimizer: sf0.1 surfaced Jaccard-0.98 pairs
    * missed across ALL bands (theoretical miss odds ~1e-5 per pair).
    * Mixed parameters restore pairwise-independence and the banding
    * math the candidate-recall claims are computed from. */
  def hashParams(i: Int): (Long, Long) = (
    Math.floorMod(mix64(2L * i), MinhashPrime - 1) + 1L,
    Math.floorMod(mix64(2L * i + 1), MinhashPrime))

  /** MinHash signatures with `numHashes` affine hashes
    * h_i(x) = (a_i·x + b_i) mod p, banded `numHashes/rowsPerBand` ways.
    * a_i/b_i derive from i by a fixed mixing formula ([[hashParams]] —
    * no RNG → reproducible and oracle-replicable).
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
      val (a, b) = hashParams(i)
      // reduce sid into [0, p) FIRST: xxhash64 ids (production path) span
      // the full signed-64 range and sid·a would overflow long (ANSI mode
      // throws). For dictionary ids (< p always) pmod is the identity, so
      // the oracle-checked values are unchanged.
      min((pmod(col("sid"), lit(MinhashPrime)) * a + b) % MinhashPrime)
        .as(s"mh_$i")
    }
    val sig = shIds.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    cutBands(sig, idCol, numHashes, rowsPerBand)
  }

  /** Cut a signature frame (idCol, mh_0..mh_{numHashes−1}) into
    * (id, band, bucket) rows — row-local. */
  private def cutBands(sig: DataFrame, idCol: String, numHashes: Int,
                       rowsPerBand: Int): DataFrame = {
    val bands = (0 until numHashes / rowsPerBand).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
          .map(i => col(s"mh_$i").cast("string")): _*).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Production minhash banding computed ROW-LOCALLY: shingling, xxhash64
    * shingle ids, all `numHashes` minima and the band cut are higher-order
    * functions over the text column — NO shuffle at all until the
    * consumer's band-bucket groupBy, vs the exploded path's signature
    * aggregation shuffling |docs × shingles| rows. At corpus scale the
    * signature stage therefore costs one map pass over the data.
    *
    * Exactly the [[shingles]] → [[shingleIds]](production) →
    * [[minhashBuckets]] composition, row-fused: same shingle semantics
    * (distinct word n-grams, sub-n stubs dropped, docs with no valid
    * shingle emit no rows), same hash family ([[hashParams]]), same
    * (id, band, bucket) output — equality is pinned by test. The
    * dictionary path cannot fuse this way (its ids need a global sort),
    * which is fine: it exists for oracle parity, not production. */
  def minhashBucketsRowLocal(docs0: DataFrame, idCol: String,
                             textCol: String, n: Int, numHashes: Int,
                             rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand " +
        s"($rowsPerBand) — a partial band would silently drop hashes")
    // the numHashes×|shingles| hash evaluation below is the most
    // CPU-dense map stage in the engine (profiled ~3s single-threaded
    // at sf0.1): spread an underparallelized scan before it (guide
    // §2.5 — the one-row-group fixture-file case; a no-op whenever the
    // source already plans enough splits, i.e. at any real scale)
    val docs = graft.Tables.spreadSmallScan(docs0)
    val toks = split(col(textCol), " ")
    // same guarded-sequence construction as [[shingles]] (one source of
    // truth for the semantics, pinned equal by OpsSpec): short docs
    // emit no positions, so no per-shingle re-split filter is needed
    val starts = when(size(toks) >= n, sequence(lit(0), size(toks) - n))
      .otherwise(array().cast("array<int>"))
    val shingleArr = array_distinct(transform(starts,
      i => array_join(slice(toks, i + 1, lit(n)), " ")))
    val sids = transform(shingleArr,
      s => pmod(xxhash64(s), lit(MinhashPrime)))
    val mins = (0 until numHashes).map { i =>
      val (a, b) = hashParams(i)
      array_min(transform(col("__sids"), x => (x * a + b) % MinhashPrime))
        .as(s"mh_$i")
    }
    val sig = docs.select(col(idCol), sids.as("__sids"))
      .filter(size(col("__sids")) > 0)
      .select(col(idCol) +: mins: _*)
    cutBands(sig, idCol, numHashes, rowsPerBand)
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
    // borrowed, not taken: a caller-held cache on `buckets` is reused
    // and left intact (see jaccardPairs)
    val (bk, releaseBk) = RelationalOps.borrowMaterialized(buckets)
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
    releaseBk()
    out
  }


  /** Incremental near-dup probe — the PRODUCTION dedup shape at corpus
    * scale: a new crawl batch is probed against the STANDING corpus
    * LSH index instead of re-deduping the whole corpus per ingest. Both
    * sides carry the same banding (the dictionary-free xxhash64 path
    * makes their bucket keys agree with no shared state), and the join
    * BROADCASTS the batch side. CONTRACT: the batch must be the
    * broadcast-sized side — that is the operator's definition (a crawl
    * batch vs a 100 TB index): the batch probe join is an explicit
    * broadcast, the tiny stop-list anti join is broadcast-eligible
    * (AQE converts at runtime — never a forced driver collect), and
    * the index is written bucket-partitioned once at build; the
    * guard's size aggregation shuffles bucket-key partials once, which
    * a production deploy skips by precomputing sizes at index build. A batch that
    * grows with the corpus belongs in [[minhashCandidates]] over the
    * union instead. Corpus-side buckets larger than `maxBucketSize`
    * are dropped BEFORE the join (the same boilerplate guard as
    * minhashCandidates — one all-identical-header bucket would
    * otherwise emit |corpus∩bucket|·|batch∩bucket| rows; review r20
    * pass-3 #2). Output: distinct (new_id, old_id) candidate pairs;
    * verify with true Jaccard downstream. */
  def incrementalCandidates(corpusBuckets: DataFrame,
                            batchBuckets: DataFrame,
                            idCol: String,
                            maxBucketSize: Int = 1000): DataFrame = {
    // two consumers of the corpus lineage (the size aggregation + the
    // anti-join probe side): borrow-persist the CALLER's frame — not a
    // local projection of it, which would never match a caller-held
    // cache — so the expensive index lineage runs once, not twice, and
    // a cache held across several probe batches is reused intact (the
    // jaccardPairs convention)
    val (cached, releaseC) = RelationalOps.borrowMaterialized(corpusBuckets)
    val corpus = cached
      .select(col("band"), col("bucket"), col(idCol).as("old_id"))
    // the OVERSIZED-bucket list is tiny by construction (boilerplate
    // buckets are few in distinct count), so the anti join is
    // broadcast-eligible; deliberately UNHINTED — AQE converts from
    // runtime stats when the list is genuinely tiny, and a degenerate
    // cap that inflates it degrades to a shuffled anti join instead of
    // a forced driver collect (the trimLowImportance / jaccardPairs
    // convention). The size aggregation itself shuffles bucket-key
    // partials once; a production deploy precomputes bucket sizes at
    // index-build time and skips that pass entirely.
    val stop = corpus.groupBy("band", "bucket")
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > maxBucketSize)
      .select("band", "bucket")
    val out = RelationalOps.materialized(
      corpus.join(stop, Seq("band", "bucket"), "left_anti")
        .join(broadcast(batchBuckets.select(col("band"), col("bucket"),
          col(idCol).as("new_id"))), Seq("band", "bucket"))
        .select(col("new_id"), col("old_id")).distinct())
    releaseC()
    out
  }

  /** 16-bit SimHash from per-doc distinct token ids: bit b of token t is
    * bit b of (t·2654435761); the signature bit is the sign of the summed
    * ±1 votes. Everything is integer arithmetic → engine-agnostic.
    *
    * Plan shape: like [[minhashBuckets]], all `bits` vote sums are
    * columns of ONE hash aggregation — a single map-side-combined
    * shuffle of |tokIds| rows. (The explode-a-bit-index-table
    * formulation shuffles bits× the rows through TWO aggregations; at
    * 16 bits that is a 16× shuffle multiplier for identical output.)
    * The signature is then assembled row-locally from the vote signs. */
  def simhash(tokIds: DataFrame, idCol: String, bits: Int = 16): DataFrame = {
    val votes = (0 until bits).map { b =>
      // reduce sid into [0, 2^31-1) FIRST — the same guard as
      // minhashBuckets: production xxhash64 sids span the full
      // signed-64 range and sid·2654435761 would overflow long (ANSI
      // mode throws). For dictionary ids (row_number ranks, always far
      // below 2^31-1) pmod is the identity, so the oracle-checked
      // values are unchanged; the oracle mirrors the same reduction.
      sum(when(expr(
          s"((pmod(sid, 2147483647) * 2654435761) >> $b) & 1") === 1, 1)
        .otherwise(-1)).as(s"__v_$b")
    }
    tokIds.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map(b =>
            when(col(s"__v_$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
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
    require(maxHamming >= 0 && maxHamming < bits,
      s"simhashPairs: maxHamming ($maxHamming) must be in [0, bits=" +
        s"$bits) — at maxHamming >= bits a pigeonhole segment has zero " +
        "width, its mask is 0, and every document lands in one bucket: " +
        "the banded self-join silently degrades to the O(n²) cross " +
        "join the banding exists to prevent")
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
    * Two algorithms behind the `algorithm` flag:
    *
    *  - `"minlabel"` (default) — iterative min-label propagation,
    *    O(diameter) rounds at one action per round. Near-duplicate
    *    graphs are star/clique shaped (diameter ≤ ~3), so 3–4 rounds in
    *    practice; the right default for dedup.
    *  - `"star"` — alternating large-star/small-star contraction
    *    (Kiveris et al., "Connected Components in MapReduce and
    *    Beyond"), O(log² n) worst-case rounds (O(log n) typical; the
    *    O(log n) bound is for the two-phase variant) on ANY graph
    *    shape — the fallback for
    *    adversarial long-path graphs, where min-label needs O(n) rounds
    *    (a 100-node path: 99 rounds vs ~6). Costs more per round (two
    *    star transforms + an exact edge-set convergence probe), so it
    *    only wins when the diameter is large.
    *
    * Both truncate lineage per round by rebuilding the frame from an
    * explicitly persisted row RDD (`LogicalRDD` boundary) — without
    * truncation the plan tree doubles every iteration and Catalyst
    * re-derives the whole chain (the classic iterative-algorithm trap).
    * Owning the RDD handle (instead of `localCheckpoint`, whose storage
    * is only freed when the GC collects the RDD) lets each round
    * unpersist the previous round's blocks eagerly, so at most two
    * round tables are ever materialized; the RETURNED frame stays
    * persisted for the caller.
    *
    * `checkpointDir`: when set, every per-round RDD is ALSO reliably
    * checkpointed there (`RDD.checkpoint`), so at cluster scale the
    * iteration survives executor loss — a lost cache block under plain
    * persist would otherwise force recomputing the round's lineage from
    * its (already-unpersisted) parent. The default (None, in-memory
    * persist only) is right for the local sandbox; checkpoint files
    * accumulate under the dir until it is deleted by the caller. If the
    * loop succeeds but the post-loop checkpoint-dir restore fails, the
    * restore error propagates (the CheckpointScope contract) and the
    * would-be result's cached blocks are released first — the caller
    * gets an exception, never a leaked persist (ADVICE r12).
    *
    * Returns (id, label) for every node that appears in an edge, label
    * = min id of the component; a silent non-converged return would
    * hand back WRONG labels, so non-convergence throws. */
  def connectedComponents(edges: DataFrame, a: String, b: String,
                          maxIter: Int = 25,
                          checkpointDir: Option[String] = None,
                          algorithm: String = "minlabel"): DataFrame = {
    // The checkpoint dir is session-global state: point the session at
    // the caller's dir only for the loop's duration, then restore —
    // leaving it set would silently redirect every later checkpoint user
    // (the fitAlsGrid lesson, ADVICE r8). The restore goes through
    // [[graft.CheckpointScope]], which pins the prior dir's ROOT: a naive
    // restore via the resolved (uuid-suffixed) getCheckpointDir value
    // would re-anchor one level deeper on every call and nest
    // unboundedly across repeated CC runs (ADVICE r9). The checkpoint
    // FILES written under the caller's dir are theirs to keep or delete
    // (documented above).
    val sc = edges.sparkSession.sparkContext
    val prevCp = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // Track the loop's own exception so the restore can distinguish its
    // two failure contracts (CheckpointScope Scaladoc): suppress-into-
    // primary when one is in flight, rethrow when the loop succeeded.
    var primary: Throwable = null
    var release: () => Unit = () => ()
    try {
      val (labels, rel) = algorithm match {
        case "minlabel" => ccMinLabel(edges, a, b, maxIter, checkpointDir.isDefined)
        case "star"     => ccLargeSmallStar(edges, a, b, maxIter, checkpointDir.isDefined)
        case other => throw new IllegalArgumentException(
          s"connectedComponents: unknown algorithm '$other' " +
            "(expected 'minlabel' or 'star')")
      }
      release = rel
      labels
    } catch { case t: Throwable =>
      primary = t; throw t
    } finally if (checkpointDir.isDefined) {
      try graft.CheckpointScope.restore(sc, prevCp, Option(primary))
      catch { case t: Throwable =>
        // restore() rethrows only on the success path (primary == null),
        // so the computed result — deliberately left persisted for a
        // caller that now never receives a handle — would leak its
        // cached blocks for the session's lifetime (ADVICE r12).
        // Release them before the restore failure propagates; the
        // checkpoint FILES under the caller's dir remain theirs to
        // delete regardless (documented above).
        try release() catch { case u: Throwable => t.addSuppressed(u) }
        throw t
      }
    }
  }

  /** Persist (and, with a checkpoint dir, reliably checkpoint) `df`'s
    * rows and rebuild the frame from the anchored RDD — the per-round
    * lineage-truncation boundary both CC algorithms iterate on. LAZY:
    * the caller decides which action materializes the blocks (both CC
    * loops fold their convergence probe into the round's own
    * materializing job, so each round stays ONE job; star uses this
    * helper only for its pre-loop node/edge anchors). The caller owns
    * the returned RDD handle for eager unpersist. */
  private def anchorRound(df: DataFrame, checkpoint: Boolean)
      : (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val r = df.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (checkpoint) r.checkpoint()
    (df.sparkSession.createDataFrame(r, df.schema), r)
  }

  /** Returns the label frame plus a release thunk that unpersists its
    * backing blocks — used only on the success-path restore-failure
    * branch above, where the frame is about to be discarded. */
  private def ccMinLabel(edges: DataFrame, a: String, b: String,
                         maxIter: Int, useCp: Boolean)
      : (DataFrame, () => Unit) = {
    val spark = edges.sparkSession
    val sym = RelationalOps.materialized(
      edges.select(col(a).as("src"), col(b).as("dst"))
        .union(edges.select(col(b).as("src"), col(a).as("dst")))
        .distinct())
    var (labels, labelsRdd) = anchorRound(
      sym.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")), useCp)
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
      if (useCp) nextRdd.checkpoint()
      nextRdd.count()
      converged = acc.value == 0L
      labelsRdd.unpersist(blocking = false)
      labels = spark.createDataFrame(nextRdd, labels.schema)
      labelsRdd = nextRdd
      iter += 1
    }
    sym.unpersist()
    // real dup graphs converge in a handful of rounds, so hitting this
    // means the graph has a pathological long path (raise maxIter or
    // switch to algorithm = "star"). Release the final round's label
    // blocks before throwing — the caller never receives a handle to
    // them (the star variant does the same with its eRdd/nodesRdd).
    if (!converged) {
      labelsRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    }
    (labels, () => labelsRdd.unpersist(blocking = false))
  }

  /** Large-star/small-star contraction. Each round:
    *
    *  - LARGE-STAR: every node u attaches each strictly LARGER neighbor
    *    to m(u) = min(Γ(u) ∪ {u}) — long tails fold onto local minima;
    *  - SMALL-STAR: every node u re-attaches its smaller-or-equal
    *    neighborhood (and itself) to that minimum — partial stars merge.
    *
    * Both transforms preserve connectivity and only ever point nodes at
    * SMALLER ids, and the edge set is a fixpoint exactly when every
    * component is a star rooted at its minimum — so convergence is
    * detected by an EXACT set-equality probe on the canonicalized edge
    * set, never a sampled or hashed one: both sets are distinct, so
    * `next == prev` ⟺ `|next| == |prev| ∧ next ⊆ prev`, and the subset
    * half rides the round's own materializing job as a per-row
    * "edge is new" flag tallied through an accumulator (the min-label
    * pattern) — ONE action per round, no separate probe job.
    * O(log² n) worst-case rounds for this alternating variant (Kiveris
    * et al. prove O(log n) only for the two-phase variant; in practice
    * O(log n)-ish on real graphs); ~4 shuffles + 1 action per round vs
    * min-label's 2 + 1, which is why it is the flagged fallback rather
    * than the default. */
  private def ccLargeSmallStar(edges: DataFrame, a: String, b: String,
                               maxIter: Int, useCp: Boolean)
      : (DataFrame, () => Unit) = {
    val spark = edges.sparkSession
    // every node that appears in any edge must come out labeled, and the
    // contraction ends with only (child, root) edges — remember the node
    // set up front (self-loop-only nodes would otherwise vanish with
    // their dropped loops)
    val (nodes, nodesRdd) = anchorRound(
      edges.select(col(a).as("id")).union(edges.select(col(b).as("id")))
        .distinct(), useCp)
    // canonical form throughout: u > v, no self-loops, distinct
    var (e, eRdd) = anchorRound(
      edges.select(col(a).as("x"), col(b).as("y"))
        .filter(col("x") =!= col("y"))
        .select(greatest(col("x"), col("y")).as("u"),
          least(col("x"), col("y")).as("v"))
        .distinct(), useCp)
    var eCnt = eRdd.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // large-star over the symmetric neighborhood
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mL = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mL, "u").filter(col("v") > col("u"))
        .select(col("v").as("lu"), col("m").as("lv"))
        .filter(col("lu") =!= col("lv"))
        .distinct()
      // small-star: `large` is already (bigger, smaller)-directed, so
      // Γ≤(u) is exactly its v-side; m = min(Γ≤ ∪ {u}) = min(v)
      val mS = large.groupBy("lu").agg(min(col("lv")).as("m"))
      val small = large.join(mS, "lu")
        .filter(col("lv") =!= col("m"))
        .select(col("lv").as("s"), col("m"))
        .union(mS.select(col("lu").as("s"), col("m")))
        .select(greatest(col("s"), col("m")).as("u"),
          least(col("s"), col("m")).as("v"))
        .distinct()
      // ONE action per round (the min-label pattern): the next edge set
      // is left-joined against the previous round's cached set, and the
      // job that materializes this round's blocks tallies a per-row
      // "edge is new" flag through an accumulator while its count
      // doubles as the size probe. Both sets are distinct, so
      // acc == 0 (next ⊆ prev) plus equal counts is EXACT set equality.
      // A task retry can only over-count the accumulator, so a spurious
      // non-zero costs at most one extra round; a zero is exact, so
      // convergence is never declared early.
      val flagged = small
        .join(e.withColumn("__old", lit(true)), Seq("u", "v"), "left")
        .select(col("u"), col("v"), col("__old").isNull.as("__new"))
      val acc = spark.sparkContext.longAccumulator(s"cc_star_new_$iter")
      val nextRdd = flagged.rdd.map { row =>
        if (row.getBoolean(2)) acc.add(1L)
        org.apache.spark.sql.Row(row.get(0), row.get(1))
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (useCp) nextRdd.checkpoint()
      val nextCnt = nextRdd.count()
      converged = nextCnt == eCnt && acc.value == 0L
      eRdd.unpersist(blocking = false)
      e = spark.createDataFrame(nextRdd, e.schema)
      eRdd = nextRdd; eCnt = nextCnt
      iter += 1
    }
    if (!converged) {
      eRdd.unpersist(blocking = false)
      nodesRdd.unpersist(blocking = false)
      throw new IllegalStateException(
        s"connectedComponents(star) did not converge in $maxIter rounds")
    }
    // fixpoint edges are (child, root) stars; roots label themselves
    val labels = RelationalOps.materialized(
      nodes.join(e.select(col("u").as("id"), col("v").as("__root")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__root"), col("id")).as("label")))
    eRdd.unpersist(blocking = false)
    nodesRdd.unpersist(blocking = false)
    (labels, () => { labels.unpersist(blocking = false); () })
  }
}
