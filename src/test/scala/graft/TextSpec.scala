package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("id", "text")

  test("tokenCount: whitespace runs, empty → 0") {
    val df = Seq((1L, "hello  world\tfoo\nbar"), (2L, ""), (3L, "   ")).toDF("id", "text")
    val r = df.select($"id", TextFunctions.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(r == Map(1L -> 4, 2L -> 0, 3L -> 0))
  }

  test("tokens follow the RE2 whitespace contract: \\x0B is NOT a separator") {
    // RE2 \s = [ \t\n\f\r]; Java's adds \x0B. The DuckDB oracle (RE2)
    // defines the contract, so a vertical tab must stay inside a token.
    val r = one("a\u000Bb c").select(TextFunctions.tokens($"text"))
      .as[Seq[String]].head()
    assert(r == Seq("a\u000Bb", "c"))
  }

  test("bpeish tokens split letter/digit/punct runs") {
    val r = one("abc123, def!").select(TextFunctions.bpeishTokens($"text"))
      .as[Seq[String]].head()
    assert(r == Seq("abc", "123", ",", "def", "!"))
  }

  test("charShingles and wordShingles") {
    val cs = one("abcd").select(TextFunctions.charShingles($"text", 3)).as[Seq[String]].head()
    assert(cs == Seq("abc", "bcd"))
    val ws = one("a b c d").select(TextFunctions.wordShingles($"text", 2)).as[Seq[String]].head()
    assert(ws == Seq("a b", "b c", "c d"))
  }

  test("langId identifies real-language sentences") {
    val df = Seq(
      (1L, "the cat sat on the mat and it was happy with this"),
      (2L, "der Hund ist nicht mit der Katze und das ist ein Problem"),
      (3L, "le chat est dans la maison et il est pour le moment"),
      (4L, "el perro es un animal que vive en la casa con su familia"),
      (5L, "你好世界这是一个中文句子没有空格"),
      (6L, "xxqq zzyy kwv")).toDF("id", "text")
    val r = df.select($"id", TextFunctions.langId($"text").as("l")).as[(Long, String)].collect().toMap
    assert(r(1L) == "en"); assert(r(2L) == "de"); assert(r(3L) == "fr")
    assert(r(4L) == "es"); assert(r(5L) == "zh"); assert(r(6L) == "und")
  }

  test("fingerprint is whitespace/case-invariant") {
    val df = Seq((1L, "Hello   World"), (2L, "hello world"), (3L, "different")).toDF("id", "text")
    val fps = df.select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("simhash: identical → equal, near-dup → small hamming, unrelated → large") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val near = (1 to 57).map(i => s"tok$i").mkString(" ") + " other words"
    val far = (100 to 160).map(i => s"zz$i").mkString(" ")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "text")
    val h = df.select($"id", TextFunctions.simhash($"text").as("s")).as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L) == h(2L))
    assert(ham(h(1L), h(3L)) <= 16)
    assert(ham(h(1L), h(4L)) > 16)
  }

  test("qualityScore rewards normal prose over digit walls") {
    val prose = "The quick brown fox jumps over the lazy dog and this is a fine sentence that continues for a while."
    val junk = "11111 22222 33333 44444 55555 66666 77777 88888 99999 00000 11111 22222"
    val r = Seq((1L, prose), (2L, junk)).toDF("id", "text")
      .select($"id", TextFunctions.qualityScore($"text").as("q")).as[(Long, Double)].collect().toMap
    assert(r(1L) > 0.8)
    assert(r(2L) < 0.5)
  }
}
