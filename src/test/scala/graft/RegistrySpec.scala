package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry contract checks: names unique, oracle discipline held. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique and well-formed") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q(ml)?[0-9]+_[a-z0-9_]+")))
  }

  test("every non-ML query carries a DuckDB oracle") {
    val noOracle = QueryRegistry.all.filter(_.oracle.isEmpty).map(_.name)
    // vector-typed / model outputs are the ONLY permitted omissions
    assert(noOracle.forall(_.startsWith("qml")), s"missing oracle: $noOracle")
  }

  test("oracle SQL never references fixture paths or engine internals") {
    QueryRegistry.all.flatMap(_.oracle).foreach { sql =>
      assert(!sql.contains("/root/"), "oracle must address tables by name")
    }
  }
}
