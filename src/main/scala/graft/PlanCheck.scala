package graft
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    println("=== q02 filter pushdown ===")
    println(Queries.q02FilterPushdown(spark, d).queryExecution.executedPlan.toString.take(3000))
    println("=== q03 join (broadcast?) ===")
    println(Queries.q03JoinRevenue(spark, d).queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
