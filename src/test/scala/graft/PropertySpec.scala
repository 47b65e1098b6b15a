package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.export.{Exporter, LightFormatter, SizeExpr}
import graft.util.PyJson

/** ScalaCheck properties (SURVEY.md §5 plan: ordering stability is in
  * PipelineSpec on Spark; these cover the pure kernels). */
object PropertySpec extends Properties("graft") {

  private val anyText: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', '"', '\\', '`'),
    Gen.oneOf('あ', '本', '→', '', '')))
    .map(_.mkString)

  property("pyjson ascii-only with quote framing") = forAll(anyText) { s =>
    val out = PyJson.str(s)
    out.forall(c => c >= 0x20 && c <= 0x7e) &&
      out.head == '"' && out.last == '"'
  }

  property("pyjson exact escape lengths") = forAll(anyText) { s =>
    val expected = 2 + s.map {
      case c if c == '"' || c == '\\' || c == '\b' || c == '\t' ||
        c == '\n' || c == '\f' || c == '\r' => 2
      case c if c < 0x20 || c > 0x7e => 6
      case _ => 1
    }.sum
    PyJson.str(s).length == expected
  }

  property("formatter strips trailing blanks") = forAll(anyText) { s =>
    val r = LightFormatter.render(s)
    r.isEmpty || r.split("\n", -1).last.trim.nonEmpty ||
      // inside an auto-closed fence the last line is ```
      r.endsWith("```")
  }

  property("formatter collapses blank runs outside code") =
    forAll(anyText.map(_.replace("`", ""))) { s =>
      val lines = LightFormatter.render(s).split("\n", -1)
      !lines.toSeq.sliding(2).exists {
        case Seq(a, b) => a.trim.isEmpty && b.trim.isEmpty
        case _ => false
      }
    }

  property("formatter is identity on fence-free single-spaced text") =
    forAll(Gen.listOf(Gen.identifier).map(_.mkString(" "))) { s =>
      LightFormatter.render(s) == s
    }

  property("size expr IEC multiples") =
    forAll(Gen.choose(1, 99999), Gen.oneOf("", "K", "M", "G")) { (n, u) =>
      val mult = Map("" -> 1L, "K" -> 1024L, "M" -> 1024L * 1024,
        "G" -> 1024L * 1024 * 1024)(u)
      SizeExpr.parse(s"$n$u") == n * mult
    }

  property("sanitizeFilename bounded and windows-safe") =
    forAll(anyText) { s =>
      val out = Exporter.sanitizeFilename(s)
      out.length <= 120 &&
        !out.exists(c => "<>:\"/\\|?*".contains(c) || c < 0x20)
    }

  property("partFileName bounded, windows-safe, and collision-distinct") =
    forAll(anyText, anyText) { (a, b) =>
      val fa = Exporter.partFileName(a, "")
      val fb = Exporter.partFileName(b, "")
      fa.length <= 120 &&
        !fa.exists(c => "<>:\"/\\|?*".contains(c) || c < 0x20) &&
        (a == b || fa != fb || a.isEmpty || b.isEmpty)
    }

  // E16 format_bytes (reference utils.py:34-39) — reference-computed pairs
  property("formatBytes matches reference format_bytes") = Prop.all(
    Prop(SizeExpr.formatBytes(0L) == "0.0B"),
    Prop(SizeExpr.formatBytes(1023L) == "1023.0B"),
    Prop(SizeExpr.formatBytes(1024L) == "1.0KiB"),
    Prop(SizeExpr.formatBytes(4 * 1024 * 1024L) == "4.0MiB"),
    Prop(SizeExpr.formatBytes(1536L) == "1.5KiB"),
    Prop(SizeExpr.formatBytes(5L * 1024 * 1024 * 1024 * 1024) == "5.0TiB"))

  property("ts heuristic split at 1e11") = Prop.all(
    forAll(Gen.choose(0L, 99999999999L)) { v =>
      Exporter.tsToSeconds(v.toDouble) == v.toDouble
    },
    forAll(Gen.choose(100000000000L, 4102444800000L)) { v =>
      Exporter.tsToSeconds(v.toDouble) == v.toDouble / 1000.0
    })
}
