package graft

import java.nio.file.{Files, Paths}

import graft.assess.Assessor
import graft.convert.{Db2Renderer, RenderConfig}
import graft.snowflake.SnowflakeRenderer

/** CLI surface for the DDL engine (local, non-Spark path).
  *
  * Usage: DdlMain <db2|snowflake> <assess|convert> <ddl-file> [externalVolume]
  *
  * Reads a DDL script, runs the requested pipeline, prints the converted
  * DDL (convert) or the report JSON (assess) to stdout. The Spark-side
  * equivalent (distributed over many scripts) lives in graft.api.Engine.
  */
object DdlMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: DdlMain <db2|snowflake> <assess|convert> <ddl-file> [externalVolume]")
      sys.exit(2)
    }
    val Array(dialect, mode, path) = args.take(3)
    // stream mode takes a directory; everything else a single script file
    lazy val ddl = new String(Files.readAllBytes(Paths.get(path)), "UTF-8")
    val cfg = RenderConfig(externalVolume =
      if (args.length > 3) args(3) else "<EXTERNAL_VOLUME>")

    (dialect, mode) match {
      case ("db2", "convert") =>
        val r = Db2Renderer.convert(ddl, cfg)
        if (!r.success) { System.err.println(s"error: ${r.errorMessage.getOrElse("")}"); sys.exit(1) }
        System.err.println(s"-- tables=${r.tablesConverted} ewi=${r.ewiCount}")
        println(r.icebergDdl)
      case ("db2", "assess") =>
        println(Assessor.toJson(Assessor.assess(ddl)))
      case ("snowflake", "convert") =>
        val r = SnowflakeRenderer.convert(ddl, cfg)
        if (!r.success) { System.err.println(s"error: ${r.errorMessage.getOrElse("")}"); sys.exit(1) }
        System.err.println(s"-- tables=${r.tablesConverted} ewi=${r.ewiCount} issues=${r.issues.length}")
        println(r.icebergDdl)
      case ("snowflake", "assess") =>
        val conv = SnowflakeRenderer.convert(ddl, cfg)
        println(Assessor.toJson(SnowflakeRenderer.assessmentReport(conv, ddl)))
      case ("db2", "stream") =>
        // path is a DIRECTORY of .sql scripts: converts them through the
        // Structured-Streaming pipeline (one micro-batch per file set)
        val spark = org.apache.spark.sql.SparkSession.builder()
          .master("local[4]")
          .appName("graft-ddl-stream")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val out = graft.streaming.StreamingOps.runToMemory(
          graft.streaming.StreamingOps.ddlConvertStream(spark, path), "cli_stream")
        out.select("script_id", "tables_converted", "ewi_count")
          .collect()
          .foreach(r => println(s"${r.get(0)}\ttables=${r.get(1)}\tewi=${r.get(2)}"))
        spark.stop()
      case (d @ ("db2" | "snowflake"), "batch") =>
        // path is a directory of .sql scripts; writes <name>.iceberg.sql
        // and <name>.report.json beside each (differential-test harness).
        val dirFile = new java.io.File(path)
        val isScript = (n: String) => n.endsWith(".sql") &&
          !n.endsWith(".iceberg.sql") && !n.contains(".ref.")
        for (f <- dirFile.listFiles().filter(f => isScript(f.getName)).sortBy(_.getName)) {
          val script = new String(Files.readAllBytes(f.toPath), "UTF-8")
          val base = f.getAbsolutePath.stripSuffix(".sql")
          if (d == "db2") {
            val conv = Db2Renderer.convert(script, cfg)
            Files.writeString(Paths.get(base + ".iceberg.sql"), conv.icebergDdl)
            Files.writeString(Paths.get(base + ".meta.txt"),
              s"ewi=${conv.ewiCount} tables=${conv.tablesConverted} success=${conv.success}")
            val report = Assessor.assess(script)
            Files.writeString(Paths.get(base + ".report.json"),
              Assessor.toJson(report))
            val ts = "2026-01-01 00:00:00"
            Files.writeString(Paths.get(base + ".report.txt"),
              graft.assess.ReportRenderer.renderAssessment(report, ts)
                .mkString("", "\n", "\n"))
            Files.writeString(Paths.get(base + ".conversion.txt"),
              graft.assess.ReportRenderer.renderConversion(conv, report, ts)
                .mkString("", "\n", "\n"))
          } else {
            val conv = SnowflakeRenderer.convert(script, cfg)
            Files.writeString(Paths.get(base + ".iceberg.sql"), conv.icebergDdl)
            Files.writeString(Paths.get(base + ".meta.txt"),
              s"ewi=${conv.ewiCount} tables=${conv.tablesConverted} success=${conv.success}")
          }
        }
        println(s"batch done: ${dirFile.listFiles().count(f => isScript(f.getName))} scripts")
      case other =>
        System.err.println(s"unknown dialect/mode: $other"); sys.exit(2)
    }
  }
}
