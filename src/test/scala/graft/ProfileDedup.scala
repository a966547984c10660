package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.ops.RelationalOps

/** Dev-only stage profiler for the dedup family (optimization guide §1:
  * measure first). Times each sub-stage of the jaccardPairs / minhash
  * pipelines with the same noop action Bench uses. Not registered, not a
  * test — run with `sbt "Test/runMain graft.ProfileDedup [sfDir]"`. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = BenchSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.range(100).count()
    spark.read.parquet(s"$sfDir/region.parquet").limit(1).count()

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Tables.documents(spark, sfDir)
    t("docs scan")(noop(docs))
    t("shingles explode")(noop(Dedup.shingles(docs, "doc_id", "text", 3)))

    // ---- jaccardPairs internals ----------------------------------------
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    var shM: DataFrame = null
    t("materialized(sh)") { shM = RelationalOps.materialized(sh) }
    val sizes = shM.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    t("sizes agg")(noop(sizes))
    val stop = shM.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") > 1000).select("shingle")
    t("stop agg")(noop(stop))
    val pruned = shM.join(stop, Seq("shingle"), "left_anti")
    t("pruned anti join")(noop(pruned))
    val a = pruned.select(col("doc_id").as("id_a"), col("shingle"))
    val b = pruned.select(col("doc_id").as("id_b"), col("shingle"))
    val pairCounts = a.join(b.hint("shuffle_hash"), Seq("shingle"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    t("pair self-join + count")(noop(pairCounts))
    // alternative: bounded collect_list + row-local pair explosion
    val grouped = pruned.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairsAlt = grouped.select(explode(flatten(transform(col("ids"),
        (x, i) => transform(slice(col("ids"), i + 2,
            greatest(size(col("ids")) - i - 1, lit(0))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    t("ALT collect_list pair gen + count")(noop(pairsAlt))
    t("pair self-join + count (2nd)")(noop(pairCounts))
    t("ALT collect_list (2nd)")(noop(pairsAlt))
    shM.unpersist()
    var jp: DataFrame = null
    t("full jaccardPairs") {
      jp = Dedup.jaccardPairs(
        Dedup.shingles(docs, "doc_id", "text", 3), "doc_id")
      jp.unpersist()
    }

    // ---- q32 dictionary-minhash internals ------------------------------
    val sh2 = RelationalOps.materialized(
      Dedup.shingles(docs, "doc_id", "text", 3))
    t("dict zipWithRank")(noop(RelationalOps.zipWithRank(
      sh2.select("shingle").distinct(), Seq(col("shingle")), "sid")))
    var ids: DataFrame = null
    t("shingleIds join") {
      ids = Dedup.shingleIds(sh2, useDictionaryIds = true)
      noop(ids)
    }
    var bk: DataFrame = null
    t("minhash signature agg + bands") {
      bk = Dedup.minhashBuckets(ids, "doc_id", 16, 4)
      noop(bk)
    }
    t("minhashCandidates") {
      val c = Dedup.minhashCandidates(bk, "doc_id")
      c.unpersist()
    }
    sh2.unpersist()

    // ---- q87 row-local production path ---------------------------------
    var bkRl: DataFrame = null
    t("row-local banding 24x3") {
      bkRl = Dedup.minhashBucketsRowLocal(docs, "doc_id", "text", 3, 24, 3)
      noop(bkRl)
    }
    t("candidates (row-local)") {
      val c = Dedup.minhashCandidates(bkRl, "doc_id")
      c.unpersist()
    }
    spark.stop()
  }
}
