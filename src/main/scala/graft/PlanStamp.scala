package graft


/** Standalone plan-shape stamp writer (VERDICT r19 #2): produces the same
  * per-query `{n_exchanges, has_broadcast, wholestage}` JSON Bench emits,
  * WITHOUT the timed runs — so the plan-regression gate
  * (`scripts/plan_gate.sh`) can run standalone, not only as a by-product
  * of a full bench. Building a query's DataFrame is planning-only for
  * the relational registry; the eager queries execute while
  * constructing their result relations — the ML-harness fits and
  * q106's bounded streaming run — so a full stamp costs roughly the
  * ML subtotal plus ~2 s (sf0.1), still far below a full bench. Their
  * stamped shape is the local result relation, not the inner
  * fit/streaming topology (same convention as the bench stamp; the
  * streaming topology is pinned by StreamParitySpec + the env-gated
  * suites, not the plan gate).
  *
  * A query whose construction or capture throws is OMITTED from the
  * stamp — the diff then reports it as REMOVED and exits 1, so a
  * failure can never read as a clean gate.
  *
  * Usage: runMain graft.PlanStamp [sfDir] [outPath]
  * Defaults: sf0.1 (the scale the committed plan_shape_r*.json baselines
  * were captured at — broadcast decisions key on file-size stats, so the
  * diff must compare same-scale stamps) and target/plan_shape_stamp.json
  * (never the bench-owned target/plan_shape.json).
  */
object PlanStamp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.drop(1).headOption
      .getOrElse("target/plan_shape_stamp.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = OnlyFilter.resolve("planstamp",
      QueryRegistry.all.map(_.name).toSet)
    // SAME session knobs as Bench, by construction (BenchSession —
    // the stamp must describe the plans the bench would get)
    val spark = BenchSession.build(cpus)
    val selected = QueryRegistry.all
      .filter(q => only.forall(_.contains(q.name)))
    val shapes = selected.flatMap { q =>
      val shape = try Some(q.name -> PlanShape.of(q.fn(spark, sfDir)))
      catch { case e: Throwable =>
        System.err.println(s"[planstamp] ${q.name} FAILED (omitted — " +
          s"diff will read it as REMOVED): $e")
        None
      }
      // release anything a multi-pass op left persisted, as Bench does
      BenchSession.releaseCaches(spark)
      shape
    }.toMap
    val p = java.nio.file.Paths.get(outPath)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p, (PlanShape.toJson(shapes) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[planstamp] ${shapes.size}/${selected.size} shapes -> $p")
    spark.stop()
    if (shapes.size != selected.size) sys.exit(1)
  }
}
