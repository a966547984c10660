package graft

import org.scalatest.funsuite.AnyFunSuite

/** Planted-case pins for the bench outlier re-run triggers
  * (BenchRerun.scala) — no SparkSession needed; the trigger logic is
  * pure. The r17 adjudication's four real outliers are the fixture. */
class BenchRerunSpec extends AnyFunSuite {

  // the r17 driver map's four manufactured regressions, with the
  // builder's stamped same-binary values as the reference
  private val reference = Map(
    "q73_stratified_sample" -> 0.31, "q75_scalar_functions" -> 0.93,
    "q44_corr_matrix" -> 1.33, "q85_freq_sketch" -> 0.34,
    "qml53_classifiers" -> 16.2, "q01_trim_semijoin" -> 0.8)

  test("the four r17 planted outliers all trigger; quiet queries do not") {
    val reported = Map(
      "q73_stratified_sample" -> 6.22, "q75_scalar_functions" -> 10.37,
      "q44_corr_matrix" -> 5.52, "q85_freq_sketch" -> 1.06,
      "q01_trim_semijoin" -> 0.85)
    assert(BenchRerun.rerunSet(reported, reference) == Set(
      "q73_stratified_sample", "q75_scalar_functions",
      "q44_corr_matrix", "q85_freq_sketch"))
  }

  test("boundary: exactly 3x the reference does NOT trigger (strict >)") {
    val r = Map("q01_trim_semijoin" -> 2.4) // 3 × 0.8 exactly
    assert(BenchRerun.rerunSet(r, reference).isEmpty)
    assert(BenchRerun.rerunSet(Map("q01_trim_semijoin" -> 2.401),
      reference) == Set("q01_trim_semijoin"))
  }

  test("references at or above 5s never trigger (ML-fit swings are real)") {
    // qml53 at 3.1× its 16.2s reference — a genuine fit-cost swing class
    assert(BenchRerun.rerunSet(Map("qml53_classifiers" -> 50.0),
      reference).isEmpty)
  }

  test("errors, missing references, and non-positive references disarm") {
    assert(BenchRerun.rerunSet(
      Map("q73_stratified_sample" -> -1.0), reference).isEmpty)
    assert(BenchRerun.rerunSet(Map("q99_new_this_round" -> 9.0),
      reference).isEmpty)
    assert(BenchRerun.rerunSet(Map("qz" -> 9.0), Map("qz" -> -1.0)).isEmpty)
    assert(BenchRerun.rerunSet(Map("qz" -> 9.0), Map.empty).isEmpty)
  }

  test("parseQueriesMap reads a durable bench line; malformed input disarms") {
    val line = """{"metric":"total","value":146.8,"protocol":"p",
      |"queries":{"q73_stratified_sample":0.31,"q44_corr_matrix":1.33,
      |"q_err":-1},"errors":{},"runs":{"q73_stratified_sample":[0.31,0.33]}}
      |""".stripMargin
    val m = BenchRerun.parseQueriesMap(line)
    assert(m("q73_stratified_sample") == 0.31 && m("q44_corr_matrix") == 1.33)
    // -1 error sentinels parse through but can never classify (r <= 0)
    assert(m("q_err") == -1.0)
    assert(BenchRerun.parseQueriesMap("{clipped...").isEmpty)
    assert(BenchRerun.parseQueriesMap("""{"no_queries_field":1}""").isEmpty)
    assert(BenchRerun.parseQueriesMap("""{"queries":[1,2]}""").isEmpty)
    assert(BenchRerun.parseQueriesMap(
      """{"queries":{"qa":"fast"}}""").isEmpty)
  }

  test("referenceFor: a different-scale or unstamped reference disarms") {
    val stamped = """{"sf":"/root/testdata/sf0.1","queries":{"qa":0.3}}"""
    assert(BenchRerun.referenceFor(stamped, "/root/testdata/sf0.1") ==
      Map("qa" -> 0.3))
    // sf1 run against an sf0.1 reference: every sub-5s query would read
    // >3x for legitimate reasons — the pass must disarm, not mass-fire
    assert(BenchRerun.referenceFor(stamped, "/root/testdata/sf1").isEmpty)
    // pre-r18 artifact without an sf stamp, or clipped JSON: disarm
    assert(BenchRerun.referenceFor("""{"queries":{"qa":0.3}}""",
      "/root/testdata/sf0.1").isEmpty)
    assert(BenchRerun.referenceFor("{clipped", "/root/testdata/sf0.1").isEmpty)
    // benign respelling (trailing slash) of the SAME directory must NOT
    // disarm — a silent permanent disarm would be unobservable
    assert(BenchRerun.referenceFor(stamped, "/root/testdata/sf0.1/") ==
      Map("qa" -> 0.3))
    assert(BenchRerun.referenceFor(
      """{"sf":"/root/testdata/sf0.1//","queries":{"qa":0.3}}""",
      "/root/testdata/sf0.1") == Map("qa" -> 0.3))
  }

  test("newestBuilderArtifact picks the highest committed round") {
    // the driver's fresh checkout has no target/bench_out.json (the r18
    // disarm); the fallback must pick the newest committed artifact
    assert(BenchRerun.newestBuilderArtifact(Seq(
      "bench_builder_r12.json", "bench_builder_r18.json", "BENCH_r18.json",
      "bench_builder_r15.json", "README.md", "bench_builder_r9.json"))
      .contains("bench_builder_r18.json"))
    // numeric, not lexicographic: r9 < r12
    assert(BenchRerun.newestBuilderArtifact(Seq(
      "bench_builder_r9.json", "bench_builder_r12.json"))
      .contains("bench_builder_r12.json"))
    // near-misses never match (no partial-name or directory surprises)
    assert(BenchRerun.newestBuilderArtifact(Seq(
      "bench_builder_r.json", "bench_builder_r18.json.bak",
      "xbench_builder_r18.json", "BENCH_r18.json")).isEmpty)
    assert(BenchRerun.newestBuilderArtifact(Seq.empty).isEmpty)
  }

  test("end-to-end: parsed reference + reported map yields the r17 verdict") {
    val durable =
      """{"metric":"total","queries":{"q73_stratified_sample":0.31,
        |"q75_scalar_functions":0.93,"qml53_classifiers":16.2}}""".stripMargin
    val ref = BenchRerun.parseQueriesMap(durable)
    val reported = Map("q73_stratified_sample" -> 6.22,
      "q75_scalar_functions" -> 0.95, "qml53_classifiers" -> 33.5)
    assert(BenchRerun.rerunSet(reported, ref) ==
      Set("q73_stratified_sample"))
  }
}
