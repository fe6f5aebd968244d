package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all DataFrame specs (session startup
  * costs seconds; specs share it and never stop it — the JVM exit
  * tears it down).
  */
object SparkHarness {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
