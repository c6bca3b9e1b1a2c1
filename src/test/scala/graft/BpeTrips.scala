package graft
import org.apache.spark.sql.SparkSession
object BpeTrips {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (b <- Seq(64, 128, 256)) {
      val t0 = System.nanoTime()
      val (m, trips) = queries.TextAnalysis.bpeFitBatched(spark, "/root/testdata/sf0.1", 32, b)
      println(f"batch=$b trips=$trips merges=${m.size} wall=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
