package graft.tools
import org.apache.spark.sql.SparkSession
object IvfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"LAB $label%-20s rows=$n%-7d ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    for (i <- 1 to 3)
      time(s"ann_ivf run$i") {
        graft.SparkEntry.queries("ann_ivf")(spark, sfDir).count()
      }
  }
}
