package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan-inspection utility: prints the formatted physical plan of the
  * named declared queries so pushdown / broadcast / codegen spans can
  * be reviewed. Usage: runMain graft.tools.ExplainCheck q1 q_join_enrich */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
