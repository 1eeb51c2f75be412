package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.assess.Assessor
import graft.convert.{Db2Renderer, RenderConfig}
import graft.mapping.TypeMapper
import graft.model.ConversionStatus
import graft.parse.{Db2Parser, StatementSplitter}

/** Property-based invariants (SURVEY.md §5.2.3): generated DDL over the
  * type grammar must uphold structural guarantees regardless of shape. */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property under ScalaTest (scalatestplus bridge is
    * not in the offline dependency cache). */
  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(60), p)
    assert(res.passed, res.status.toString)
  }

  private val typeGen: Gen[String] = Gen.oneOf(
    "SMALLINT", "INTEGER", "INT", "BIGINT", "DECIMAL", "NUMERIC", "REAL",
    "FLOAT", "DOUBLE", "DECFLOAT", "CHAR", "VARCHAR", "LONG VARCHAR", "CLOB",
    "GRAPHIC", "VARGRAPHIC", "DBCLOB", "BINARY", "VARBINARY", "BLOB",
    "DATE", "TIME", "TIMESTAMP", "XML", "ROWID", "BOOLEAN")

  private val identGen: Gen[String] = for {
    h <- Gen.alphaUpperChar
    t <- Gen.listOfN(6, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val colGen: Gen[String] = for {
    name <- identGen
    t <- typeGen
    len <- Gen.option(Gen.choose(1, 300000000))
    notNull <- Gen.oneOf("", " NOT NULL")
  } yield {
    val params = t match {
      case "DECIMAL" | "NUMERIC" => len.map(l => s"(${l % 50 + 1},${l % 10})").getOrElse("")
      case "DATE" | "BOOLEAN" | "XML" | "ROWID" | "LONG VARCHAR" => ""
      case _ => len.map(l => s"($l)").getOrElse("")
    }
    s"$name $t$params$notNull"
  }

  private val tableGen: Gen[String] = for {
    schema <- identGen
    name <- identGen
    cols <- Gen.nonEmptyListOf(colGen).map(_.take(12))
  } yield s"CREATE TABLE $schema.$name (\n  ${cols.mkString(",\n  ")}\n);"

  private val scriptGen: Gen[String] =
    Gen.nonEmptyListOf(tableGen).map(_.take(6).mkString("\n\n"))

  test("every generated column maps to exactly one known target type") {
    val targets = Set("INTEGER", "BIGINT", "FLOAT", "DOUBLE", "STRING",
      "BINARY", "DATE", "TIME(6)", "TIMESTAMP_NTZ(6)", "BOOLEAN")
    check(Prop.forAll(typeGen, Gen.option(Gen.choose(1, 300000000))) { (t, len) =>
      val m = TypeMapper.mapType(t, len, len, len.map(_ % 10))
      targets.contains(m.targetType) || m.targetType.startsWith("NUMBER(")
    })
  }

  test("statuses come from the closed domain; DIRECT never carries an EWI") {
    val statuses = Set(ConversionStatus.Direct, ConversionStatus.Compatible,
      ConversionStatus.Lossy, ConversionStatus.Unsupported)
    check(Prop.forAll(typeGen, Gen.option(Gen.choose(1, 300000000))) { (t, len) =>
      val m = TypeMapper.mapType(t, len, len, None)
      statuses.contains(m.status) &&
        (m.status != ConversionStatus.Direct || m.ewiCode.isEmpty)
    })
  }

  test("parse: every generated table is found; columns never exceed generated count") {
    check(Prop.forAll(scriptGen) { script =>
      val n = script.split("CREATE TABLE").length - 1
      val result = Db2Parser.parse(script)
      result.tables.length == n && result.errors.isEmpty
    })
  }

  test("scores stay in [0,100]; level consistent with score") {
    check(Prop.forAll(scriptGen) { script =>
      val r = Assessor.assess(script)
      val scores = Seq(r.overallScore, r.datatypeScore, r.constraintScore,
        r.partitionScore, r.specialFeaturesScore) ++
        r.tableAssessments.map(_.readinessScore)
      scores.forall(s => s >= 0.0 && s <= 100.0) &&
        r.tableAssessments.forall(t =>
          t.readinessLevel == Assessor.scoreToLevel(t.readinessScore))
    })
  }

  test("EWI count equals the number of markers in the rendered output") {
    check(Prop.forAll(scriptGen) { script =>
      val r = Db2Renderer.convert(script, RenderConfig())
      val markers = "!!!RESOLVE EWI!!!".r.findAllIn(r.icebergDdl).length
      r.ewiCount == markers
    })
  }

  test("splitter: total statement count is stable under terminator choice") {
    val stmts = Gen.nonEmptyListOf(identGen.map(n => s"CREATE TABLE $n (X INT)")).map(_.take(8))
    check(Prop.forAll(stmts, Gen.oneOf(";", "@")) { (ss, term) =>
      StatementSplitter.split(ss.mkString(term) + term).length == ss.length
    })
  }
}
