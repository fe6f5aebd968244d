package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round tooling: dump `.explain("formatted")` for the
  * named queries to `plans/<tag>/<name>_<suffix>.txt` — the judge
  * checks plan claims in OPTIMIZATION_r*.md against these files.
  *
  * Usage: runMain graft.ExplainPlans <suffix> <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (cores),
  *      SPARK_GRAFT_PLANS_DIR (output dir, default plans/r15).
  * Not part of the driver contract; never executes the plans.
  */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ExplainPlans <suffix> <q1,q2,...>")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r15")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain] unknown query $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(mode)
            val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
            java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
            val exchanges = "(?m)^.*Exchange".r.findAllIn(txt).size
            System.err.println(f"[explain] $name%-28s exchanges=$exchanges " +
              s"-> $p")
          } catch { case e: Throwable =>
            System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
