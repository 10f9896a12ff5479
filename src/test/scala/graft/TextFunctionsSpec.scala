package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("fingerprint matches hand-computed rolling hash") {
    val fp = Seq("ab").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
      .collect()(0).getLong(0)
    assert(fp == (97L * 31 + 98) % 1000000007L) // 'a'=97, 'b'=98
  }

  test("langId follows marker priority") {
    val df = Seq(
      ("the data query", "en"),   // 'the' wins
      ("data query join", "de"),  // 'data' wins
      ("query join words", "fr"),
      ("join words words", "es"),
      ("nothing matches here", "zh")
    ).toDF("text", "expected")
    df.select((TextFunctions.langId(col("text")) === col("expected")).as("ok"))
      .collect().foreach(r => assert(r.getBoolean(0)))
  }

  test("quality score and TTR stay in [0,1] on arbitrary word soups (property)") {
    val rng = new scala.util.Random(42)
    val samples = (1 to 50).map { _ =>
      (1 to (1 + rng.nextInt(300))).map(_ => s"w${rng.nextInt(50)}").mkString(" ")
    }
    val rows = samples.toDF("text")
      .select(
        TextFunctions.typeTokenRatio(col("text")).as("ttr"),
        TextFunctions.qualityScore(col("text")).as("q"))
      .collect()
    rows.foreach { row =>
      val (ttr, q) = (row.getDouble(0), row.getDouble(1))
      assert(ttr > 0 && ttr <= 1.0 && q >= 0 && q <= 1.0)
    }
  }

  test("shingles produce n-2 distinct trigrams on distinct-word text") {
    val sh = Seq("a b c d e").toDF("text")
      .select(TextFunctions.shingles(TextFunctions.tokens(col("text")), 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d e"))
  }

  test("token counts: whitespace vs bpe-ish") {
    val row = Seq("abc de1 x!").toDF("text")
      .select(
        TextFunctions.tokenCount(col("text")).as("ws"),
        TextFunctions.bpeishCount(col("text")).as("bpe"))
      .collect()(0)
    assert(row.getInt(0) == 3)
    assert(row.getInt(1) == 5) // abc, de, 1, x, !
  }

  test("pii redaction replaces emails and ips with typed tags and counts them") {
    val row = Seq("mail a.b+c@ex-1.org then 10.0.255.7 and 999.1.2.3 but not 1.2.3")
      .toDF("t")
      .select(
        TextFunctions.redactPii(col("t")).as("red"),
        TextFunctions.emailCount(col("t")).as("ne"),
        TextFunctions.ipv4Count(col("t")).as("ni"))
      .collect()(0)
    // 999.1.2.3 is syntactically a dotted quad (triage, no range check);
    // 1.2.3 (three octets) is not
    assert(row.getString(0) == "mail <EMAIL> then <IP> and <IP> but not 1.2.3")
    assert(row.getInt(1) == 1 && row.getInt(2) == 2)
  }

  test("canonical text: case/punct/space variants collapse, NFC composes, idempotent") {
    val variants = Seq(
      "The Quick   Brown Fox!",
      "  the quick\tbrown FOX??",
      "the,quick;brown.fox",
      "THE QUICK BROWN FOX")
    val rows = variants.toDF("t")
      .select(TextFunctions.canonicalText(col("t")).as("c"))
      .collect().map(_.getString(0)).toSet
    // "the,quick" has no space separator — the comma is stripped, words fuse
    assert(rows == Set("the quick brown fox", "thequickbrownfox"))
    // NFC: decomposed e+combining-acute equals the composed form
    val nfc = Seq(("Caf\u00e9", "Cafe\u0301")).toDF("a", "b")
      .select(
        TextFunctions.canonicalText(col("a")).as("ca"),
        TextFunctions.canonicalText(col("b")).as("cb"))
      .collect()(0)
    assert(nfc.getString(0) == "café" && nfc.getString(0) == nfc.getString(1))
    // idempotence: canonicalizing a canonical form is a no-op
    val twice = variants.toDF("t")
      .select(
        TextFunctions.canonicalText(col("t")).as("once"),
        TextFunctions.canonicalText(TextFunctions.canonicalText(col("t"))).as("twice"))
      .collect()
    twice.foreach(r => assert(r.getString(0) == r.getString(1)))
    // digits survive, other symbols do not
    val digits = Seq("a1-b2_c3 +42%").toDF("t")
      .select(TextFunctions.canonicalText(col("t")).as("c")).collect()(0)
    assert(digits.getString(0) == "a1b2c3 42")
  }

  test("containment catches a subset-duplicate Jaccard misses") {
    // a is wholly contained in b, but b is 4x larger
    val a = (1 to 10).map(i => s"w$i")
    val b = a ++ (11 to 40).map(i => s"w$i")
    val row = Seq((a, b)).toDF("a", "b")
      .select(
        TextFunctions.containment(col("a"), col("b")).as("cont"),
        TextFunctions.jaccard(col("a"), col("b")).as("jac"))
      .collect()(0)
    assert(row.getDouble(0) == 1.0) // fully contained
    assert(row.getDouble(1) == 0.25) // 10 / 40 — below any near-dup bar
  }
}
