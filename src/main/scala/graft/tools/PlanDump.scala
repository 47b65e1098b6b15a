package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print per-query plan-shape stats (exchange count, scale-
  * killer join nodes, partition-less windows) for the named queries —
  * the same measurements QueriesSmokeSpec pins, runnable standalone
  * when choosing a budget for a new query.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> [queryName...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Seq(sfDir, only @ _*) = args.toSeq: @unchecked
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only.contains(n) }
    sel.foreach { case (name, fn) =>
      spark.catalog.clearCache()
      val qe = fn(spark, sfDir).queryExecution
      val plan = qe.executedPlan.toString
      val nEx = "Exchange".r.findAllMatchIn(plan).size
      val bad = Seq("BroadcastNestedLoopJoin", "CartesianProduct")
        .filter(plan.contains)
      val nPw = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.size
      println(s"PLAN $name exchanges=$nEx badJoins=${bad.mkString("|")} " +
        s"partitionlessWindows=$nPw")
    }
    spark.stop()
  }
}
