package graft

import org.scalatest.funsuite.AnyFunSuite

/** Typed Dataset[T] ingest validation (SURVEY §1.3: case-class views
  * "where type safety is cheap — ingest validation"): `as[T]` checks the
  * fixture schema against the case class at ANALYSIS time, so a fixture
  * drift (missing column, incompatible type) fails fast and readably
  * instead of deep inside a query. The relational layer stays DataFrame
  * (typed lambdas would defeat pushdown/codegen — deliberate). */
// top-level: Spark encoders cannot instantiate suite-inner case classes
case class LineitemRow(l_orderkey: Long, l_partkey: Long,
                       l_quantity: Double, l_extendedprice: Double)
case class BadRow(l_orderkey: Long, no_such_column: String)

class TypedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = "/root/testdata/sf0.001"

  test("as[T] validates the fixture schema at analysis time") {
    import spark.implicits._
    val ds = Tables.lineitem(spark, Sf)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
      .as[LineitemRow]
    val first = ds.head()
    assert(first.l_orderkey > 0 && first.l_extendedprice > 0.0)
  }

  test("as[T] fails fast on fixture drift (missing column)") {
    import spark.implicits._
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Tables.lineitem(spark, Sf).as[BadRow].head()
    }
    assert(e.getMessage.toLowerCase.contains("no_such_column"))
  }
}
