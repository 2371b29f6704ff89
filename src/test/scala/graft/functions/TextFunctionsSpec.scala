package graft.functions

import graft.SparkSpec
import graft.functions.{TextFunctions => T}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  private def one(colExpr: org.apache.spark.sql.Column, text: String): Row = {
    import spark.implicits._
    Seq(text).toDF("t").select(colExpr).head()
  }

  test("tokens: whitespace split, blanks dropped") {
    one(T.tokens(col("t")), "the  quick\tbrown fox ").getSeq[String](0) shouldBe
      Seq("the", "quick", "brown", "fox")
    one(T.tokens(col("t")), "").getSeq[String](0) shouldBe Seq.empty
    one(T.tokenCount(col("t")), "a b c").getInt(0) shouldBe 3
  }

  test("bpe-ish token count splits words and punctuation") {
    one(T.bpeishTokenCount(col("t")), "don't stop, now!").getInt(0) shouldBe 7
    // don + ' + t + stop + , + now + !
  }

  test("ratios and quality on empty text are 0, not NaN") {
    one(T.punctRatio(col("t")), "").getDouble(0) shouldBe 0.0
    one(T.stopwordRatio(col("t")), "").getDouble(0) shouldBe 0.0
    one(T.meanTokenLen(col("t")), "").getDouble(0) shouldBe 0.0
  }

  test("stopword ratio and punct ratio hand-computed") {
    one(T.stopwordRatio(col("t"), Seq("the", "a")), "the cat a hat dog")
      .getDouble(0) shouldBe 0.4 +- 1e-9
    one(T.punctRatio(col("t")), "ab,!").getDouble(0) shouldBe 0.5 +- 1e-9
  }

  test("langId picks the profile with most stopword hits") {
    one(T.langId(col("t")), "the cat and the dog is here").getString(0) shouldBe "en"
    one(T.langId(col("t")), "der hund und die katze ist").getString(0) shouldBe "de"
    one(T.langId(col("t")), "zzz qqq xxx").getString(0) shouldBe "und"
  }

  test("wordShingles and charShingles") {
    one(T.wordShingles(col("t"), 2), "a b c d").getSeq[String](0) shouldBe
      Seq("a b", "b c", "c d")
    one(T.wordShingles(col("t"), 5), "a b").getSeq[String](0) shouldBe Seq.empty
    one(T.charShingles(col("t"), 3), "abcd").getSeq[String](0) shouldBe
      Seq("abc", "bcd")
  }

  test("jaccard of array columns") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    df.select(T.jaccard($"x", $"y")).head().getDouble(0) shouldBe 0.5 +- 1e-9
  }

  test("repetition ratio: hand-computed values and short-doc zeros") {
    // "a b a b a": tokens 5 distinct 2 -> rep1 = 0.6;
    // 2-grams [a b, b a, a b, b a] 4 distinct 2 -> rep2 = 0.5;
    // 3-grams [a b a, b a b, a b a] 3 distinct 2 -> rep3 = 1 - 2/3
    val t = "a b a b a"
    one(T.repetitionRatio(col("t"), 1), t).getDouble(0) shouldBe 0.6 +- 1e-12
    one(T.repetitionRatio(col("t"), 2), t).getDouble(0) shouldBe 0.5 +- 1e-12
    one(T.repetitionRatio(col("t"), 3), t).getDouble(0) shouldBe
      (1.0 - 2.0 / 3.0) +- 1e-12
    // all-distinct text has zero repetition; too-short and empty give 0
    one(T.repetitionRatio(col("t"), 2), "p q r s").getDouble(0) shouldBe 0.0
    one(T.repetitionRatio(col("t"), 3), "x y").getDouble(0) shouldBe 0.0
    one(T.repetitionRatio(col("t"), 1), "").getDouble(0) shouldBe 0.0
  }

  test("repetitionRatios struct agrees with per-n repetitionRatio") {
    import spark.implicits._
    val texts = Seq("a b a b a", "p q r s", "x y", "", "w w w w w w")
    val r = T.repetitionRatios(col("t"), Seq(1, 2, 3))
    texts.toDF("t").select(
        r.getField("rep1"), r.getField("rep2"), r.getField("rep3"),
        T.repetitionRatio(col("t"), 1), T.repetitionRatio(col("t"), 2),
        T.repetitionRatio(col("t"), 3))
      .collect().foreach { row =>
        row.getDouble(0) shouldBe row.getDouble(3)
        row.getDouble(1) shouldBe row.getDouble(4)
        row.getDouble(2) shouldBe row.getDouble(5)
      }
  }

  test("rolling fingerprint: Column and Scala mirrors agree") {
    val texts = Seq("", "a", "hello world", "spark vector join", "ü ü ü")
    import spark.implicits._
    val got = texts.toDF("t")
      .select(T.fingerprintRolling(col("t"))).collect().map(_.getLong(0))
    got.toSeq shouldBe texts.map(RollingHash.fingerprint)
  }

  test("md5 fingerprint is the standard hex digest") {
    one(T.fingerprintMd5(col("t")), "abc").getString(0) shouldBe
      "900150983cd24fb0d6963f7d28e17f72"
  }

  test("pii: email and ipv4 detection counts") {
    val t = "mail a.b+c@ex-ample.org or root@10.1.2.3 node at 192.168.0.1 done"
    // root@10.1.2.3 is NOT email-shaped (digit TLD) — it stays an IP hit
    one(T.emailCount(col("t")), t).getInt(0) shouldBe 1
    one(T.ipv4Count(col("t")), t).getInt(0) shouldBe 2
    one(T.emailCount(col("t")), "no pii here").getInt(0) shouldBe 0
  }

  test("pii: redaction replaces all occurrences, emails before ips") {
    val t = "a@b.co and c@d.io from 1.2.3.4"
    one(T.redactPii(col("t")), t).getString(0) shouldBe
      "<EMAIL> and <EMAIL> from <IP>"
    // an address with an IP-shaped host must redact as ONE email, not
    // leave a dangling ip fragment
    one(T.redactPii(col("t")), "x root@10.1.2.3.net y").getString(0) shouldBe
      "x <EMAIL> y"
    one(T.redactPii(col("t")), "plain text").getString(0) shouldBe "plain text"
  }

  test("stripMarkup: blocks die with their content, tags become spaces, " +
      "entities drop, whitespace collapses") {
    val html = "<html><head><style>p { x: 1 }</style></head><body>" +
      "<h1>Title</h1><p>alpha<br>beta</p>" +
      "<SCRIPT>var a = 1 < 2; if (a > 0) {}</SCRIPT>" +
      "gamma&nbsp;delta &#169; done</body></html>"
    one(T.stripMarkup(col("t")), html).getString(0) shouldBe
      "Title alpha beta gamma delta done"
    // a<br>b must NOT fuse: tags are replaced by spaces
    one(T.stripMarkup(col("t")), "a<br>b").getString(0) shouldBe "a b"
    // plain text is a fixed point
    one(T.stripMarkup(col("t")), "plain old text").getString(0) shouldBe
      "plain old text"
    // empty and all-markup inputs give empty text
    one(T.stripMarkup(col("t")), "<p></p>").getString(0) shouldBe ""
  }

  test("stripMarkup: case-insensitive blocks, multiline content") {
    val html = "keep <Style Type=\"a\">\nmulti\nline\n</STYLE> this"
    one(T.stripMarkup(col("t")), html).getString(0) shouldBe "keep this"
    val script = "x <script src=\"a.js\">\nlet y = \"<p>\";\n</script> z"
    one(T.stripMarkup(col("t")), script).getString(0) shouldBe "x z"
  }

  test("tokenChunks: stride, overlap, ragged tail, empty doc") {
    def chunks(t: String, size: Int, overlap: Int): Seq[String] =
      one(T.tokenChunks(col("t"), size, overlap), t).getSeq[String](0)
    // 7 tokens, size 3, overlap 1 -> starts 0,2,4,6
    chunks("a b c d e f g", 3, 1) shouldBe
      Seq("a b c", "c d e", "e f g", "g")
    // no overlap: disjoint cover
    chunks("a b c d e", 2, 0) shouldBe Seq("a b", "c d", "e")
    // doc shorter than one chunk: a single short chunk
    chunks("a b", 5, 2) shouldBe Seq("a b")
    // empty / blank: no chunks
    chunks("", 4, 1) shouldBe Seq.empty
    chunks("   ", 4, 1) shouldBe Seq.empty
    // every token appears in some chunk; consecutive chunks share overlap
    val rnd = new scala.util.Random(3)
    val doc = Seq.fill(50)(s"w${rnd.nextInt(9)}").mkString(" ")
    val cs = chunks(doc, 8, 3).map(_.split(" ").toSeq)
    cs.flatten.mkString(" ") should include(doc.split(" ").last)
    cs.init.foreach(_.size shouldBe 8)
    cs.sliding(2).foreach {
      case Seq(a, b) => a.takeRight(3) shouldBe b.take(3)
      case _ =>
    }
    an[IllegalArgumentException] should be thrownBy
      T.tokenChunks(col("t"), 4, 4)
    an[IllegalArgumentException] should be thrownBy
      T.tokenChunks(col("t"), 0, 0)
  }

  test("normalizeText: case, punctuation, whitespace, non-ASCII, idempotence") {
    import spark.implicits._
    val cases = Seq(
      "Hello, World!"            -> "hello world",
      "  a\t\tb\nc  "            -> "a b c",
      "A.B.C's  ---  d_e"        -> "abcs de",
      "café résumé" -> "caf rsum", // non-ASCII stripped, not folded
      "!!!"                      -> "",
      "same text"                -> "same text")
    val got = cases.map(_._1).toDF("t")
      .select(T.normalizeText(col("t"))).collect().map(_.getString(0))
    got.toSeq shouldBe cases.map(_._2)
    // idempotent: normalizing a normalized string is a no-op
    val twice = cases.map(_._2).toDF("t")
      .select(T.normalizeText(col("t"))).collect().map(_.getString(0))
    twice.toSeq shouldBe cases.map(_._2)
  }
}
