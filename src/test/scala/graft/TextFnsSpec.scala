package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.textfns

class TextFnsSpec extends AnyFunSuite {
  lazy val spark = SparkT.spark
  import spark.implicits._

  test("wsTokenCount handles blanks, runs of whitespace") {
    val d = Seq("", "   ", "one", "a  b\tc").toDF("t")
    val r = d.select(textfns.wsTokenCount(col("t"))).collect().map(_.getInt(0))
    assert(r.toSeq == Seq(0, 0, 1, 3))
  }

  test("bpeish tokens: letter runs 1, digits each, symbols each") {
    val d = Seq(Tuple1("hello world 42!?")).toDF("t")
    val r = d.select(textfns.bpeishTokenCount(col("t"))).collect()(0).getInt(0)
    assert(r == 6) // hello, world, 4, 2, !, ?
  }

  test("langId picks the dominant stopword language, und when none") {
    val d = Seq(
      "the cat sat on the mat and looked to the door of it",
      "der hund und die katze das ist gut",
      "le chat et les oiseaux est une chose",
      "el gato y los pajaros es una cosa",
      "xyzzy plugh qwerty"
    ).toDF("t")
    val r = d.select(textfns.langId(col("t"))).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("quality score stays in [0,1] and rewards fluent length") {
    val d = Seq(
      "the cat and the dog of the house went to the park in the morning and the evening",
      "!!! ??? ... ;;; :::"
    ).toDF("t")
    val r = d.select(textfns.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(r.forall(x => x >= 0.0 && x <= 1.0))
    assert(r(0) > r(1))
  }

  test("cleanText strips markup and urls; scrubPii masks emails/phones") {
    val d = Seq(Tuple1("<div>Hello <b>world</b></div> read https://x.io/a?b=1 now")).toDF("t")
    assert(d.select(textfns.cleanText(col("t"))).collect()(0).getString(0) ==
      "Hello world read now")
    val p = Seq(Tuple1("mail a.b+c@ex-corp.io or call 555-1234 or 555 9876 end")).toDF("t")
    assert(p.select(textfns.scrubPii(col("t"))).collect()(0).getString(0) ==
      "mail <EMAIL> or call <PHONE> or <PHONE> end")
  }

  test("contentFingerprint is whitespace/case-insensitive md5") {
    val d = Seq(("Hello   World", "hello world")).toDF("a", "b")
    val r = d.select(textfns.contentFingerprint(col("a")).as("fa"),
      textfns.contentFingerprint(col("b")).as("fb")).collect()(0)
    assert(r.getString(0) == r.getString(1))
    assert(r.getString(0) == "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("textStats kernel matches the regex formulations exactly") {
    // the one-pass kernel must be a bit-exact twin of the regex chain
    // the DuckDB oracles replay — compare both on adversarial inputs
    val inputs = Seq(
      "the cat sat in the hat, of course!",
      "weather other tother",          // stopwords embedded in longer runs
      "to-in to_in to2in TO In tO",    // boundaries: -, _, digits, case
      "der die das und ist le les",    // multi-language hits
      "的是了在和 the 的的",            // CJK markers + mixed
      "  leading and trailing  ",
      "\tleading tab",                  // phantom-token split edge
      " \t mixed  \n ws ",
      "", " ", "\t", "one",
      "a.b,c;d:e!f?g....",
      "est est une les el los",
      "the \ud83d\ude00 cat \ud83d\ude00\ud83d\ude00 of? \ud83c\udf55", // astral-plane code points
      // U+0130: lower() full-maps \u0130\u2192"i"+U+0307, so the combining mark
      // splits what looks like one word run \u2014 "\u0130n" must NOT count as
      // "in", and a lone "\u0130" yields run "i"
      "\u0130n the \u0130stanbul \u0130 i\u0130n n\u0130 \u0130?",
      "\u212aelvin in K"               // Kelvin sign: lowercases to ASCII k both ways
    )
    import spark.implicits._
    val d = inputs.zipWithIndex.map(_.swap).toDF("id", "t")
    def regexWordHits(words: Seq[String]) =
      size(regexp_extract_all(lower(col("t")),
        lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))
    val regexSide = d.select(col("id"),
      regexWordHits(textfns.stopwords.toMap.apply("en")).as("s_en"),
      regexWordHits(textfns.stopwords.toMap.apply("de")).as("s_de"),
      regexWordHits(textfns.stopwords.toMap.apply("fr")).as("s_fr"),
      regexWordHits(textfns.stopwords.toMap.apply("es")).as("s_es"),
      textfns.stopwords.toMap.apply("zh")
        .map(w => size(regexp_extract_all(col("t"), lit(w), lit(0))))
        .reduce(_ + _).as("s_zh"),
      when(length(trim(col("t"))) === 0, lit(0))
        .otherwise(size(split(trim(col("t")), "\\s+"))).as("n_words"),
      size(regexp_extract_all(col("t"), lit(textfns.PunctPattern), lit(0))).as("n_punct"),
      length(col("t")).as("n_chars"))
    val kernelSide = d.select(col("id") +:
      Seq("s_en", "s_de", "s_fr", "s_es", "s_zh", "n_words", "n_punct", "n_chars")
        .map(f => textfns.textStats(col("t")).getField(f).as(f)): _*)
    val r = regexSide.orderBy("id").collect().map(_.toSeq)
    val k = kernelSide.orderBy("id").collect().map(_.toSeq)
    r.zip(k).zipWithIndex.foreach { case ((rr, kk), i) =>
      assert(rr == kk, s"input '${inputs(i)}': regex $rr vs kernel $kk")
    }
  }

  test("textStats word boundaries are RE2/ASCII-flavored (the oracle engine's \\b)") {
    // Java's \b is Unicode-aware (σ counts as a word char, so "σto"
    // is ONE run), RE2's is ASCII ([A-Za-z0-9_], so σ BREAKS a run
    // and "to" matches). The kernel follows RE2 because that is what
    // the DuckDB oracles replay; the Spark-regex parity test above
    // therefore only uses inputs where ASCII runs aren't flanked by
    // non-ASCII letters. Pin the RE2 behavior directly: "ΣTO" must
    // count one 'to' hit, final-sigma lowering must not invent one.
    import spark.implicits._
    val r = Seq("ΣTO der ΣΟΦΟΣ").toDF("t")
      .select(textfns.textStats(col("t")).getField("s_en").as("en"),
        textfns.textStats(col("t")).getField("s_de").as("de"))
      .collect()(0)
    assert(r.getInt(0) == 1 && r.getInt(1) == 1)
  }

  test("repetitionRatio: 0 for unique or short text, rises with duplicated n-grams") {
    val d = Seq(
      ("a b c d e f",          "unique"),   // 4 trigrams, all distinct
      ("a b c a b c a b c",    "looping"),  // 7 trigrams, 3 distinct
      ("one two",              "short")     // no trigram
    ).toDF("t", "k")
    val got = d.select(col("k"), textfns.repetitionRatio(col("t"), 3).as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("unique") == 0.0)
    assert(math.abs(got("looping") - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(got("short") == 0.0)
  }

  test("c4 cleaner: line rewrite, sentence gate, markers, null text") {
    import spark.implicits._
    val d = Seq(
      ("Good sentence with five plus words here.\nbad\nAnother fine sentence sits right here.", "mixed"),
      ("One.\nTwo!\nThree?", "short_lines"),  // all <5 words: rewrite empty
      (null.asInstanceOf[String], "nulltext"),
      ("Has brace { and a sentence. Two here. Three here.", "brace"),
      ("lorem ipsum filler. More filler here. Third sentence here.", "lorem")
    ).toDF("t", "k")
    val got = d.select(col("k"),
      textfns.c4CleanLines(col("t")).as("clean"),
      textfns.c4KeptLineCount(col("t")).as("n_kept"),
      textfns.c4SentenceCount(col("t")).as("n_sent"),
      textfns.c4Keep(col("t")).as("keep"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got("mixed").getString(1) ==
      "Good sentence with five plus words here.\nAnother fine sentence sits right here.")
    assert(got("mixed").getInt(2) == 2)
    assert(got("short_lines").getString(1) == "" &&
      got("short_lines").getInt(2) == 0)
    assert(got("short_lines").getInt(3) == 3) // sentences counted pre-rewrite
    // null text behaves as empty on every path — no nulls escape
    val n = got("nulltext")
    assert(n.getString(1) == "" && n.getInt(2) == 0 && !n.getBoolean(4))
    assert(!got("brace").getBoolean(4) && !got("lorem").getBoolean(4))
  }

  test("gopher kernel ≡ regex composition per rule; null text = empty") {
    import org.apache.spark.sql.Column
    // fixtures chosen to exercise every documented edge: phantom
    // split fields, non-overlapping symbol scan, CRLF-blocked \z,
    // space-only trim, supplementary code points, İ/Kelvin lowercase
    // structure, CJK. Non-ASCII letters stay space-delimited — where
    // an ASCII run abuts a non-ASCII letter Java's Unicode \b and
    // RE2's ASCII \b (the kernel's, the oracle's) legitimately
    // diverge (the documented textStats divergence).
    val fixtures = Seq(
      "", "   ", "\t", " \tx\t ",
      "a.. b... c....…", "# ## #…", "....",
      "- bullet\n * star\n•dot\nplain\n‣tick\n▪sq",
      "done...\nnot..\nfin…\ntrail...\r\nend\n…",
      "abc 123 _x 9y zzz", "the be to of and that have with",
      "THE BE to OF", "the thee ethe the,cat and9 _and and_",
      "É the é and KK with",
      "多 的 text with 和 chars", "mixed 🙂 emoji 🙂🙂 words",
      "only\nlines\nno words at all?", "…\n...\n. . .\n..",
      "a\nb\n", "\n\n")
      .toDF("t")
    val rules: Seq[(String, Column => Column, Column => Column)] = Seq(
      ("meanWordLen", textfns.meanWordLen, textfns.meanWordLenRegex),
      ("symbolWordRatio", textfns.symbolWordRatio, textfns.symbolWordRatioRegex),
      ("alphaWordRatio", textfns.alphaWordRatio, textfns.alphaWordRatioRegex),
      ("bulletLineRatio", textfns.bulletLineRatio, textfns.bulletLineRatioRegex),
      ("ellipsisLineRatio", textfns.ellipsisLineRatio, textfns.ellipsisLineRatioRegex),
      ("stopwordDistinct",
        c => textfns.stopwordDistinct(c).cast("int"),
        c => textfns.stopwordDistinctRegex(c).cast("int")))
    rules.foreach { case (name, fused, composed) =>
      fixtures.select(col("t"), fused(col("t")).as("f"),
          composed(col("t")).as("c")).collect()
        .foreach { r =>
          assert(r.get(1) == r.get(2),
            s"$name diverged on ${r.getString(0).replace("\n", "\\n")}: " +
              s"kernel=${r.get(1)} regex=${r.get(2)}")
        }
    }
    // word count field == the textStats kernel's count on every fixture
    fixtures.select(textfns.gopherWordCount(col("t")).as("g"),
        textfns.wsTokenCount(col("t")).as("w")).collect()
      .foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // the İ / non-ASCII-adjacency case pins the DOCUMENTED divergence
    // instead (the textStats "RE2/ASCII \b" rule): lower("İthe") =
    // "i̇the", where Java's Unicode \b sees no boundary before "the"
    // but the kernel — like RE2, the oracle engine — breaks the run
    // at the combining mark and counts it
    val iDot = Seq("İthe and İ be").toDF("t")
      .select(textfns.stopwordDistinct(col("t")).as("k"),
        textfns.stopwordDistinctRegex(col("t")).cast("int").as("j")).collect()(0)
    assert(iDot.getInt(0) == 3 && iDot.getInt(1) == 2)
    // null text: the fused family reports 0/0.0/false (the C4-family
    // convention), never null
    val nt = Seq(Option.empty[String]).toDF("t")
      .select(textfns.gopherKeep(col("t")), textfns.meanWordLen(col("t")),
        textfns.stopwordDistinct(col("t")), textfns.gopherWordCount(col("t")),
        textfns.bulletLineRatio(col("t"))).collect()(0)
    assert(!nt.getBoolean(0) && nt.getDouble(1) == 0.0 &&
      nt.getInt(2) == 0 && nt.getInt(3) == 0 && nt.getDouble(4) == 0.0)
  }

  test("gopher rules: per-metric hand values and keep edge semantics") {
    import spark.implicits._
    val passText = ("the quick brown fox jumps over a lazy dog with zeal " +
      "and grace to be of good cheer that day have fun ") * 5
    val d = Seq(
      ("",                       "empty"),
      ("   ",                    "blank"),
      ("# a # b",                "symbols"),   // 4 words, 2 '#' → 0.5
      ("- x\nplain\n- y",        "bullets"),   // 2 of 3 lines bulleted
      ("done...\nnext",          "ellipsis"),  // 1 of 2 lines
      ("abc 123 x9",             "alpha"),     // 2 of 3 words alphabetic
      (passText,                 "pass")
    ).toDF("t", "k")
    val got = d.select(col("k"),
      textfns.meanWordLen(col("t")).as("mwl"),
      textfns.symbolWordRatio(col("t")).as("sym"),
      textfns.bulletLineRatio(col("t")).as("bul"),
      textfns.ellipsisLineRatio(col("t")).as("ell"),
      textfns.alphaWordRatio(col("t")).as("alp"),
      textfns.stopwordDistinct(col("t")).as("sd"),
      textfns.gopherKeep(col("t")).as("keep"))
      .collect().map(r => r.getString(0) -> r).toMap
    // empty/blank text: every ratio 0.0, never kept
    Seq("empty", "blank").foreach { k =>
      val r = got(k)
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0 &&
        r.getDouble(5) == 0.0 && !r.getBoolean(7), k)
    }
    assert(got("symbols").getDouble(2) == 0.5)
    assert(got("bullets").getDouble(3) == 2.0 / 3.0)
    assert(got("ellipsis").getDouble(4) == 0.5)
    assert(got("alpha").getDouble(5) == 2.0 / 3.0)
    // the pass fixture clears all seven published thresholds
    val p = got("pass")
    assert(p.getBoolean(7), p.toString)
    assert(p.getInt(6) == 8) // all eight Gopher stopwords present
    // the word-count ceiling flips keep off on otherwise-clean text
    val many = Seq((("the of " * 60000) + "and be").trim).toDF("t")
      .select(textfns.wsTokenCount(col("t")).as("n"),
        textfns.gopherKeep(col("t")).as("keep")).collect()(0)
    assert(many.getInt(0) > 100000 && !many.getBoolean(1))
  }
}
