package graft

/** The bench outlier re-run pass (protocol `…_rerun`, BASELINE.md).
  *
  * Twice (r16's uniform 1.55×, r17's q73/q75/q44/q85 at 3.3–28.7×) the
  * round driver's single hot map manufactured apparent regressions on
  * sub-second plans — GC pauses and host load land disproportionately on
  * queries whose whole plan costs fractions of a second — and each cost a
  * full round-trip to adjudicate against the builder's quiet-host band.
  * This pass kills the false-regression class at the source: after the
  * main loop, any query the PREVIOUS durable full map (the stamped
  * builder run in `target/bench_out.json`) prices below 5s that this run
  * reported at more than 3× that gets extra runs, and the minimum over
  * all observed runs is reported. Bounded extra wall-clock by
  * construction (only sub-5s-plan outliers re-run, each re-run is cheap
  * because the plan is cheap); a genuine regression survives the extra
  * samples and stays visible.
  *
  * Pure trigger logic, separated from Bench's harness so the planted
  * trigger cases are testable without a SparkSession.
  */
object BenchRerun {

  /** Reference plans priced at or above this are never re-run: the ML
    * fits swing for real reasons (iteration counts, grid search) a
    * min-report would hide; their noise is tracked as its own series. */
  val SubCostCeiling = 5.0

  /** Reported-over-reference ratio that classifies an environmental
    * outlier. 3× sits far above the quiet-host band's per-query spread
    * (median same-binary ratio 1.18 in the r17 adjudication) and below
    * every manufactured regression seen so far (3.3–28.7×). */
  val OutlierRatio = 3.0

  /** Queries to re-run: reported a valid timing (not an error), the
    * reference map prices the plan sub-5s, and this run exceeded 3× the
    * reference. Absent or non-positive reference values cannot classify
    * and never trigger. */
  def rerunSet(reported: Map[String, Double],
               reference: Map[String, Double]): Set[String] =
    reported.collect {
      case (name, v)
          if v > 0.0 && reference.get(name).exists(r =>
            r > 0.0 && r < SubCostCeiling && v > OutlierRatio * r) =>
        name
    }.toSet

  /** PURE parser of a durable bench JSON's `"queries"` object into
    * name → reported seconds; any shape or parse problem — missing
    * field, clipped file, non-numeric values — yields an empty map and
    * is deliberately SILENT (this is the testable parsing primitive).
    * Bench must not call this directly: the harness entry point is
    * [[referenceFor]], which wraps the same parse and NOTES every
    * disarm — absent stamp, scale mismatch, unparseable artifact,
    * missing queries map — on stderr. Jackson rides the Spark
    * classpath. */
  def parseQueriesMap(json: String): Map[String, Double] =
    try queriesOf(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(json))
    catch { case _: Throwable => Map.empty }

  private def queriesOf(
      root: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] = {
    val qs = root.get("queries")
    if (qs == null || !qs.isObject) Map.empty
    else {
      val b = Map.newBuilder[String, Double]
      qs.fields().forEachRemaining { e =>
        if (e.getValue.isNumber) b += e.getKey -> e.getValue.asDouble()
      }
      b.result()
    }
  }

  /** The newest COMMITTED builder bench artifact among `names` (file
    * names, any order): highest round number matching
    * `bench_builder_r<N>.json`. The fallback reference when
    * `target/bench_out.json` is absent — which is exactly the driver's
    * fresh-checkout environment, the one run the re-run pass was built
    * to protect (r18: the pass disarmed there and BENCH_r18 shipped
    * dozens of environmentally-hot readings with `reruns: []`). The
    * artifact's own `sf` stamp is still validated downstream by
    * [[referenceFor]], so a stale or different-scale fallback disarms
    * rather than mis-triggers. */
  def newestBuilderArtifact(names: Seq[String]): Option[String] = {
    val P = "bench_builder_r(\\d+)\\.json".r
    names.collect { case n @ P(r) => (r.toInt, n) }
      .sortBy(t => (-t._1, t._2)).headOption.map(_._2)
  }

  /** The reference map USABLE for a run against `sfDir`: empty unless the
    * artifact's own `"sf"` stamp names the same directory (trailing
    * slashes ignored — the realistic benign-respelling class). A
    * reference priced at a smaller scale factor would mass-trigger
    * spurious re-runs at a larger one (every sub-5s-at-sf0.1 query
    * legitimately reads >3× at sf1), each re-run paid at THIS run's
    * scale — the "bounded extra wall-clock" premise only holds against a
    * same-scale reference. A missing sf stamp (pre-r18 artifact) also
    * disarms. Disarms are NOTED on stderr: silence would make the
    * r16/r17 false-regression protection unobservably off. */
  def referenceFor(json: String, sfDir: String): Map[String, Double] =
    try {
      val root = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json)
      val node = root.get("sf")
      val sf = if (node != null && node.isTextual) node.asText() else ""
      def norm(p: String) = p.replaceAll("/+$", "")
      if (sf.nonEmpty && norm(sf) == norm(sfDir)) {
        val m = queriesOf(root)
        if (m.isEmpty)
          System.err.println("[bench] reference artifact has no usable " +
            "queries map — re-run pass disarmed")
        m
      } else {
        System.err.println(s"[bench] reference sf stamp '$sf' does not " +
          s"match this run's '$sfDir' — re-run pass disarmed")
        Map.empty
      }
    } catch { case e: Throwable =>
      // every disarm is observable (clipped artifact = the documented
      // BENCH_r04/r05 class): silence here would leave the false-
      // regression protection unobservably off
      System.err.println(
        s"[bench] reference artifact unparseable — re-run pass disarmed: $e")
      Map.empty
    }
}
