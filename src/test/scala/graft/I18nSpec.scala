package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.app.{I18n, Main}

/** CLI i18n layer (C6) — resolution precedence, fallback chain and
  * format tolerance per reference i18n.py:63-119. */
class I18nSpec extends AnyFunSuite {

  test("locale resolution: cli > env > default, with normalization") {
    assert(I18n.resolveLocale(None, Map.empty) === "en")
    assert(I18n.resolveLocale(None, Map("LLP_LOCALE" -> "ja")) === "ja")
    assert(I18n.resolveLocale(Some("ja"),
      Map("LLP_LOCALE" -> "en")) === "ja") // cli wins
    assert(I18n.resolveLocale(Some("en_US"), Map.empty) === "en")
    assert(I18n.resolveLocale(Some("ja-JP"), Map.empty) === "ja")
    assert(I18n.resolveLocale(Some("fr"), Map.empty) === "en") // fallback
    assert(I18n.resolveLocale(Some(""),
      Map("LLP_LOCALE" -> "ja")) === "ja") // empty cli ignored
  }

  test("translation: params, ja catalog, en fallback, key fallback") {
    assert(I18n.t("cli.parse.done", "en",
      "threads" -> 3, "messages" -> 16)
      === "parsed 3 threads (16 messages)")
    assert(I18n.t("cli.parse.done", "ja",
      "threads" -> 3, "messages" -> 16)
      === "3 スレッド（16 メッセージ）をパースしました")
    // unknown locale → fallback catalog
    assert(I18n.t("cli.usage", "de")
      === "usage: graft.app.Main parse|export|chain ...")
    // unknown key → the key itself, never a throw
    assert(I18n.t("no.such.key", "ja") === "no.such.key")
    // format tolerance: missing params leave the template intact
    assert(I18n.t("cli.parse.done", "en")
      === "parsed {threads} threads ({messages} messages)")
  }

  test("--locale ja localizes CLI errors without changing exit codes") {
    val err = new java.io.ByteArrayOutputStream()
    val rc = Console.withErr(new java.io.PrintStream(err, true, "UTF-8")) {
      // Console.withErr does not redirect System.err, so call the
      // resolution + message path directly the way Main does
      I18n.setLocale(Some("ja"))
      try Main.run(Array("parse", "--locale", "ja",
        "--input", "/nope/missing.json", "--outdir", "/tmp/x"))
      finally I18n.setLocale(None)
    }
    assert(rc === 2)
    assert(I18n.t("cli.parse.input_missing", "ja", "path" -> "/nope")
      .contains("入力が見つかりません"))
  }
}
