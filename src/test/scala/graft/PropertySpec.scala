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

  test("PNG: encode∘decode is the identity for arbitrary pixels, dims, " +
      "color types and per-row filter choices") {
    import graft.operators.Multimodal
    val png = for {
      w <- Gen.choose(1, 12)
      h <- Gen.choose(1, 12)
      ct <- Gen.oneOf(0, 2, 4, 6)
      ch = ct match { case 0 => 1; case 2 => 3; case 4 => 2; case _ => 4 }
      samples <- Gen.listOfN(w * h * ch, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
      filters <- Gen.listOfN(h, Gen.choose(0, 4))
    } yield (w, h, ct, ch, samples, filters.toArray)
    check(Prop.forAll(png) { case (w, h, ct, ch, samples, filters) =>
      Multimodal.decodePngPixels(
        Multimodal.encodePng(w, h, ct, samples, y => filters(y))) match {
        case None => false
        case Some(px) =>
          (0 until w * h).forall { i =>
            val (r, g, b, a) = ct match {
              case 0 => (samples(i), samples(i), samples(i), -1.toByte)
              case 2 => (samples(i * 3), samples(i * 3 + 1), samples(i * 3 + 2), -1.toByte)
              case 4 => (samples(i * 2), samples(i * 2), samples(i * 2), samples(i * 2 + 1))
              case _ => (samples(i * 4), samples(i * 4 + 1), samples(i * 4 + 2), samples(i * 4 + 3))
            }
            px(i * 4) == r && px(i * 4 + 1) == g && px(i * 4 + 2) == b && px(i * 4 + 3) == a
          }
      }
    })
  }

  test("BMP: encode∘decode is the identity for arbitrary pixels and dims " +
      "(padding and bottom-up rows exercised)") {
    import graft.operators.Multimodal
    val bmp = for {
      w <- Gen.choose(1, 13) // odd widths hit every stride-padding case
      h <- Gen.choose(1, 9)
      rgb <- Gen.listOfN(w * h * 3, Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    } yield (w, h, rgb)
    check(Prop.forAll(bmp) { case (w, h, rgb) =>
      Multimodal.decodeBmpPixels(Multimodal.encodeBmp(w, h, rgb)) match {
        case None => false
        case Some(px) =>
          (0 until w * h).forall { i =>
            px(i * 4) == rgb(i * 3) && px(i * 4 + 1) == rgb(i * 3 + 1) &&
              px(i * 4 + 2) == rgb(i * 3 + 2) && px(i * 4 + 3) == -1
          }
      }
    })
  }
}
