package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query subset (re-check a few
    // queries at a big scale factor without re-running all 132)
    val only = args.lift(2).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(cpus)
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // closed-world gate: a crashed query must leave a red mark the
        // checker folds in, never a silently-absent key (a round-8
        // regression hid behind exactly that hole)
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val dir = Paths.get(s"$outDir/$name")
        Files.createDirectories(dir)
        Files.writeString(dir.resolve("_ERROR"),
          s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the DECLARED key set, so the checker iterates queries (closed
    // world) instead of output dirs (open world — crashes vanish)
    Files.writeString(Paths.get(s"$outDir/queries_keys.json"),
      selected.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    // producer-side provenance twin of the checker's __meta__ record:
    // which Spark/Java built these dumps (oracle-harness divergences
    // are version-sensitive — round 10's were)
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"),
      s"""{"spark": ${q(spark.version)}, "scala": ${q(
        scala.util.Properties.versionNumberString)}, "java": ${q(
        System.getProperty("java.version"))}}""")
    spark.stop()
  }
}
