package graft

/** Scratch diagnostic: run ONE driver query and dump its parquet +
  * oracle SQL, for fast single-oracle iteration without the full
  * Verify sweep. Usage: runMain graft.ProbeQuery <name> <sfDir> <out>
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    SparkEntry.oracleSql.get(name).foreach { sql =>
      val json = s"""{"$name": ${ujsonEscape(sql)}}"""
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
        json.getBytes("UTF-8"))
    }
    println(s"[probe] dumped $name")
    spark.stop()
  }

  private def ujsonEscape(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""
}
