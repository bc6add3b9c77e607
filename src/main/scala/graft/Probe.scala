package graft
import org.apache.spark.sql.SparkSession

/** Throwaway local probe (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = SparkEntry.entry(spark)
    e.show(truncate = false)
    println("entry rows=" + e.count())
    spark.stop()
  }
}
