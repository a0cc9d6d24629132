package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: is the q_profile_sketch gate row-set bit-deterministic
  * at the sf0.01 gate fixture — across partition counts, repeated
  * runs, and AQE on/off? HLL++ is merge-order-insensitive by
  * construction; GK percentile summaries are NOT order-insensitive in
  * general, so pinning them in a VALUES oracle is only sound if the
  * merge order Spark actually produces is stable for this fixture.
  * This probe is the evidence either way.
  */
object SketchDeterminism {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for (aqe <- Seq("true", "false")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val li = graft.sources.Tables.lineitem(spark, dir)
      for (parts <- Seq(0, 1, 3, 13, 32); run <- 1 to 2) {
        val in = if (parts == 0) li else li.repartition(parts)
        val rows = graft.operators.SketchProfile
          .sketchProfile(in, Seq("l_quantity", "l_extendedprice", "l_discount"))
          .collect().sortBy(_.getString(0))
        val repr = rows.map { r =>
          val ds = (3 until r.length).map(i =>
            java.lang.Double.doubleToLongBits(r.getDouble(i)).toHexString)
          s"${r.getString(0)} n=${r.getLong(1)} nd=${r.getLong(2)} ${ds.mkString(" ")}"
        }.mkString(" | ")
        println(s"aqe=$aqe parts=$parts run=$run  $repr")
      }
      spark.stop()
    }
  }
}
