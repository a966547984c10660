package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The plan-shape stamp (ADVICE r18 #7): the pure parser against a
  * transcribed formatted-explain fragment, and the live capture against
  * real plans whose shape is known — a groupBy (one shuffle Exchange, in
  * whole-stage codegen) and a broadcast join. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("parse: node-detail headers → counts (transcribed fragment)") {
    val formatted =
      """== Physical Plan ==
        |AdaptiveSparkPlan (9)
        |+- == Initial Plan ==
        |   Sort (8)
        |   +- Exchange (7)
        |      +- HashAggregate (6)
        |         +- Exchange (5)
        |            +- HashAggregate (4)
        |               +- BroadcastHashJoin Inner BuildRight (3)
        |                  :- Scan parquet  (1)
        |                  +- BroadcastExchange (2)
        |
        |(1) Scan parquet
        |Output [2]: [a#1, b#2]
        |
        |(2) BroadcastExchange
        |Input [1]: [k#3]
        |
        |(3) BroadcastHashJoin [codegen id : 2]
        |Left keys [1]: [a#1]
        |
        |(4) HashAggregate [codegen id : 2]
        |Keys [1]: [b#2]
        |
        |(5) Exchange
        |Input [2]: [b#2, sum#9]
        |
        |(6) HashAggregate [codegen id : 3]
        |Keys [1]: [b#2]
        |
        |(7) Exchange
        |Input [2]: [b#2, s#10]
        |
        |(8) Sort [codegen id : 4]
        |Input [2]: [b#2, s#10]
        |
        |(9) AdaptiveSparkPlan
        |Output [2]: [b#2, s#10]
        |""".stripMargin
    val s = PlanShape.parse(formatted)
    // shuffle Exchanges only — the BroadcastExchange rides hasBroadcast
    assert(s == PlanShape.Shape(nExchanges = 2, hasBroadcast = true,
      wholestage = true))
    assert(PlanShape.parse("== Physical Plan ==\n(1) Scan parquet \n") ==
      PlanShape.Shape(0, false, false))
  }

  test("of: live plans with known shape") {
    val df = (1 to 100).toDF("v")
    // groupBy → exactly one shuffle Exchange, codegen'd, no broadcast
    val agg = df.groupBy(col("v") % 7).agg(sum("v"))
    val aggShape = PlanShape.of(agg)
    assert(aggShape.nExchanges == 1 && !aggShape.hasBroadcast &&
      aggShape.wholestage, aggShape)
    // broadcast join → hasBroadcast, no shuffle Exchange
    val dim = Seq((1, "x"), (2, "y")).toDF("v", "name")
    val j = df.join(broadcast(dim), Seq("v"))
    val jShape = PlanShape.of(j)
    assert(jShape.hasBroadcast && jShape.nExchanges == 0, jShape)
    // deterministic, sorted JSON
    assert(PlanShape.toJson(Map("b" -> aggShape, "a" -> jShape)) ==
      """{"a":{"n_exchanges":0,"has_broadcast":true,"wholestage":true},""" +
        """"b":{"n_exchanges":1,"has_broadcast":false,"wholestage":true}}""")
  }
}
