package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry contract checks: names unique, oracle discipline held. */
class RegistrySpec extends AnyFunSuite {

  test("query names are unique and well-formed") {
    val names = QueryRegistry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("q(ml)?[0-9]+_[a-z0-9_]+")))
  }

  test("every query carries a DuckDB oracle (all of them, since r20)") {
    val noOracle = QueryRegistry.all.filter(_.oracle.isEmpty).map(_.name)
    // r20 retired the last rows-only entry (qml51): the registry is
    // fully oracle-checked and must never regress to a weaker check
    assert(noOracle.isEmpty, s"missing oracle: $noOracle")
  }

  test("oracle SQL never references fixture paths or engine internals") {
    QueryRegistry.all.flatMap(_.oracle).foreach { sql =>
      assert(!sql.contains("/root/"), "oracle must address tables by name")
    }
  }
}
