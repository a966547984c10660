package graft

/** Dev diagnostic: print plan-quality findings for every registered
  * non-ML query at sf0.001 — which plans contain CartesianProduct or
  * BroadcastNestedLoopJoin. The enforced form lives in PlanLintSpec. */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    QueryRegistry.all.filterNot(_.name.startsWith("qml")).foreach { q =>
      try {
        val plan = q.fn(spark, sf).queryExecution.executedPlan.toString
        val cart = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cart || bnlj)
          println(s"[planlint] ${q.name} cartesian=$cart bnlj=$bnlj")
      } catch {
        case e: Throwable =>
          println(s"[planlint] ${q.name} ERROR ${e.getClass.getSimpleName}")
      }
    }
    println("[planlint] done")
  }
}
