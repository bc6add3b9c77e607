package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Header-flexible multi-file CSV union (SURVEY.md §2.1 `scan_csv_multi`,
  * reference `stadtwerk_winterthur_collector.py:117-179`): historical
  * exports arrive as several CSVs whose column ORDER may differ between
  * files. A plain multi-path `spark.read.csv` would impose the first
  * file's header on all of them, silently mis-assigning columns — so each
  * file is read with its own header and the frames are unioned by name.
  * Per-file schema inference touches only headers + sampled rows; the
  * subsequent union is a zero-shuffle narrow op.
  */
object CsvMulti {
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths
      .map(p => spark.read
        .option("header", "true")
        .option("inferSchema", "true")
        .csv(p))
      .reduce(_.unionByName(_, allowMissingColumns = true))
}
