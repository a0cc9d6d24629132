package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{CurationRules, PipelineOps, Quantize}

/** Unit fixtures for the round-8 curation operators: Gopher rule
  * signals, C4 cleaning, per-domain caps, int8 quantization. The
  * corpus-scale value gates live in ExtQueries (q_gopher_quality /
  * q_c4_clean / q_domain_cap / q_embed_int8); these specs pin the
  * hand-computable edge semantics the gate fixture doesn't isolate.
  */
class CurationRulesSpec extends SparkSpec {
  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
  }

  // ── gopherSignals ──────────────────────────────────────────────────

  test("gopher: clean long doc with stopwords passes") {
    val words = Seq.fill(20)("the cat sat") :+ "with milk"
    val out = CurationRules.gopherSignals(docs(1L -> words.mkString(" ")), "id", "text")
      .collect().head
    assert(out.getAs[Long]("n_words") === 62)
    assert(out.getAs[Long]("stopword_count") === 21) // 20× the + 1× with
    assert(out.getAs[Double]("alpha_word_frac") === 1.0)
    assert(out.getAs[Double]("bullet_line_frac") === 0.0)
    assert(out.getAs[Long]("gopher_pass") === 1L)
  }

  test("gopher: bullet and ellipsis line fractions") {
    val out = CurationRules.gopherSignals(
      docs(1L -> "- one\n- two\nplain", 2L -> "x...\ny…"), "id", "text")
      .orderBy("id").collect()
    assert(out(0).getAs[Double]("bullet_line_frac") === 2.0 / 3.0)
    assert(out(1).getAs[Double]("ellipsis_line_frac") === 1.0)
    // doc 2: one '...' occurrence + one '…', 2 words
    assert(out(1).getAs[Double]("symbol_word_ratio") === 1.0)
  }

  test("gopher: duplicate-line fractions use beyond-first counting") {
    val out = CurationRules.gopherSignals(
      docs(1L -> "same line here\nsame line here\nother"), "id", "text")
      .collect().head
    assert(out.getAs[Double]("dup_line_frac") === 1.0 / 3.0)
    // chars: 14 + 14 + 5 = 33 total, 14 beyond-first
    assert(out.getAs[Double]("dup_line_char_frac") === 14.0 / 33.0)
  }

  test("gopher: empty and null docs fail with zeroed ratios") {
    val out = CurationRules.gopherSignals(docs(1L -> "", 2L -> null), "id", "text")
      .orderBy("id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_words") === 0L)
      assert(r.getAs[Double]("mean_word_len") === 0.0)
      assert(r.getAs[Long]("gopher_pass") === 0L)
    }
  }

  test("gopher: '#' symbols counted against words") {
    val out = CurationRules.gopherSignals(docs(1L -> "a # b # c"), "id", "text")
      .collect().head
    assert(out.getAs[Double]("symbol_word_ratio") === 2.0 / 5.0)
  }

  // ── c4Clean ────────────────────────────────────────────────────────

  test("c4: line filter keeps terminal-punctuated, wordy, js-free lines") {
    val text = Seq(
      "This is a good line.",      // kept
      "short.",                    // < 3 words
      "no terminal punct here",    // no punctuation
      "This one has JavaScript in it.", // javascript (case-insensitive)
      "Another good line here!"    // kept
    ).mkString("\n")
    val out = CurationRules.c4Clean(docs(1L -> text), "id", "text").collect().head
    assert(out.getAs[Long]("n_lines") === 5L)
    assert(out.getAs[Long]("n_lines_kept") === 2L)
    assert(out.getAs[Long]("doc_kept") === 1L)
    assert(out.getAs[String]("clean_text") ===
      "This is a good line.\nAnother good line here!")
  }

  test("c4: doc-level drops — lorem ipsum, brace, too few survivors") {
    val good = "One fine line stays._\nAnother fine line stays._".replace("_", "")
    val out = CurationRules.c4Clean(docs(
      1L -> (good + "\nwith Lorem Ipsum inside."),
      2L -> (good + "\nhas a { brace."),
      3L -> "Only one good line here.\nnope"), "id", "text")
      .orderBy("id").collect()
    assert(out.forall(_.getAs[Long]("doc_kept") === 0L))
    assert(out.forall(_.getAs[String]("clean_text") === ""))
  }

  test("augment forms keep input columns and agree with the thin forms") {
    import org.apache.spark.sql.types._
    val rows = Seq(
      Row(1L, "Keep this fine line.\nAnother keeper stays here!", "web"),
      Row(2L, "- bullet\nno punct", "books"))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("extra", StringType))))
    val ga = CurationRules.gopherAugment(df, "id", "text")
    assert(ga.columns.startsWith(Array("id", "text", "extra")))
    val thin = CurationRules.gopherSignals(df, "id", "text").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_words")).toMap
    ga.collect().foreach { r =>
      assert(r.getAs[Long]("n_words") === thin(r.getAs[Long]("id")))
      assert(r.getAs[String]("extra") != null)
    }
    val ca = CurationRules.c4Augment(df, "id", "text")
    assert(ca.columns.contains("extra") && ca.columns.contains("clean_text"))
    val caOut = ca.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("n_lines_kept")).toMap
    assert(caOut === Map(1L -> 2L, 2L -> 0L))
  }

  test("kernel ≡ declarative spelling on adversarial unicode corpora (fuzz parity)") {
    // the byte kernels promise exact parity with the collection-HOF
    // semantics the oracles replay; this drives both over generated
    // nasty inputs — multibyte chars, bullets/ellipses at boundaries,
    // empty lines, whitespace runs, nulls — and compares every raw
    // count (integers and strings only: the derived ratios divide the
    // same integers on both sides by construction)
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.functions.{filter => ffilter, _}
    import graft.functions.{CurationKernels, TextFunctions}
    val rnd = new scala.util.Random(20260814L)
    val atoms = Vector("the", "be", "of", "…", "...", "....", "#", "##x",
      "- x", "-x", "* ", "•", "• b", "日本語", "café", "🎉🎉", "{", "}",
      "lorem", "ipsum", "Lorem Ipsum", "JavaScript", "javascript", "It.",
      "end!", "why?", "q\"", "", " ", "\t", "a.b.c", "x...", "…end", "A")
    def line(): String =
      Seq.fill(rnd.nextInt(6))(atoms(rnd.nextInt(atoms.length))).mkString(" ")
    def text(): String =
      Seq.fill(rnd.nextInt(6))(line()).mkString("\n")
    val rows = (0 until 60).map(i =>
      Row(i.toLong, if (i % 17 == 0) null else text()))
    val df = spark.createDataFrame(rows.asJava, StructType(Seq(
        StructField("id", LongType), StructField("text", StringType))))
      .select(col("id"), coalesce(col("text"), lit("")).as("t"))

    // declarative gopher counts (the oracle's semantics)
    def charSum(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, l => length(l).cast("long")), lit(0L), (a, b) => a + b)
    val toks = TextFunctions.tokens(col("t"))
    val ltoks = TextFunctions.tokens(lower(col("t")))
    val lines = split(col("t"), java.util.regex.Pattern.quote("\n"))
    val declarative = df.select(col("id"),
      size(toks).cast("long").as("n_words"),
      charSum(toks).as("tok_chars"),
      ((length(col("t")) - length(replace(col("t"), lit("#"), lit("")))).cast("long") +
        ((length(col("t")) - length(replace(col("t"), lit("..."), lit("")))) / 3).cast("long") +
        (length(col("t")) - length(replace(col("t"), lit("…"), lit("")))).cast("long"))
        .as("symbols"),
      size(ffilter(lines, l => l.startsWith("- ") || l.startsWith("* ") ||
        l.startsWith("• "))).cast("long").as("bullet_lines"),
      size(ffilter(lines, l => l.endsWith("...") || l.endsWith("…"))).cast("long")
        .as("ellipsis_lines"),
      size(ffilter(toks, x => x.rlike("[A-Za-z]"))).cast("long").as("alpha_words"),
      size(ffilter(ltoks, x => x.isInCollection(CurationRules.GopherStopwords)))
        .cast("long").as("stop_count"),
      size(lines).cast("long").as("n_lines"),
      (size(lines) - size(array_distinct(lines))).cast("long").as("dup_lines"),
      charSum(lines).as("line_chars"),
      (charSum(lines) - charSum(array_distinct(lines))).as("dup_line_chars"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val kernel = df.select(col("id"),
        CurationKernels.gopherStats(col("t"), "\n").as("s"))
      .select(col("id"), col("s.*")).collect()
    assert(kernel.length === 60)
    kernel.foreach { k =>
      val d = declarative(k.getLong(0))
      (1 until k.length).foreach { i =>
        assert(k.get(i) === d.get(i),
          s"gopher field ${k.schema.fields(i).name} diverges for id ${k.getLong(0)}: " +
            s"kernel ${k.get(i)} vs declarative ${d.get(i)}\ntext: ${rows(k.getLong(0).toInt).get(1)}")
      }
    }

    // declarative c4 (line filter + rebuild + drop markers)
    val kept = ffilter(lines, l =>
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") || l.endsWith("\"")) &&
        size(TextFunctions.tokens(l)) >= 3 && !lower(l).contains("javascript"))
    val c4Decl = df.select(col("id"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("kept_text"),
      (lower(col("t")).contains("lorem ipsum") || col("t").contains("{"))
        .as("has_drop_marker"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val c4Kernel = df.select(col("id"),
        CurationKernels.c4Stats(col("t"), "\n", 3).as("s"))
      .select(col("id"), col("s.*")).collect()
    c4Kernel.foreach { k =>
      val d = c4Decl(k.getLong(0))
      (1 until k.length).foreach { i =>
        assert(k.get(i) === d.get(i),
          s"c4 field ${k.schema.fields(i).name} diverges for id ${k.getLong(0)}: " +
            s"kernel ${k.get(i)} vs declarative ${d.get(i)}")
      }
    }
  }

  // ── domainCap ──────────────────────────────────────────────────────

  test("domainCap keeps at most cap rows per domain, deterministically") {
    import spark.implicits._
    val df = (0L until 40L).map(i => (i, s"dom${i % 4}")).toDF("id", "domain")
    val capped = PipelineOps.domainCap(df, "id", "domain", cap = 3)
    val out = capped.collect()
    assert(out.length === 12)
    assert(capped.groupBy("domain").count().collect().forall(_.getLong(1) === 3L))
    assert(out.forall(r => r.getAs[Long]("domain_rank") >= 1L &&
      r.getAs[Long]("domain_rank") <= 3L))
    // partitioning-invariant: same survivors under a different layout
    val again = PipelineOps.domainCap(df.repartition(7), "id", "domain", cap = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === out.map(_.getAs[Long]("id")).toSet)
  }

  test("domainCap rejects a reserved output column collision") {
    import spark.implicits._
    val df = Seq((1L, "a", 2L)).toDF("id", "domain", "domain_rank")
    intercept[IllegalArgumentException] {
      PipelineOps.domainCap(df, "id", "domain", cap = 1)
    }
  }

  // ── quantizeInt8 ───────────────────────────────────────────────────

  test("int8 quantization: exact codes at the corpus min/mid/max") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.0f, 10.0f)),
      (2L, Seq(5.0f, 10.0f)),
      (3L, Seq(10.0f, 10.0f))).toDF("id", "vec")
    val out = Quantize.quantizeInt8(df, "id", "vec", dim = 2)
      .orderBy("id").collect()
    // dim 1: mn=0 rng=10 → 0→-128, 5→0 (floor(127.5+0.5)=128), 10→127
    // dim 2: rng=0 → code 0 everywhere
    assert(out(0).getAs[Seq[Int]]("codes") === Seq(-128, 0))
    assert(out(1).getAs[Seq[Int]]("codes") === Seq(0, 0))
    assert(out(2).getAs[Seq[Int]]("codes") === Seq(127, 0))
    // reconstruction: dequant(-128)=0 exact; degenerate dim dequants to
    // mn exactly; midpoint dequant = 128/255*10
    val mid = 128.0 / 255.0 * 10.0
    assert(out(0).getAs[Double]("recon_err") === 0.0)
    assert(out(1).getAs[Double]("recon_err") === (5.0 - mid) * (5.0 - mid))
    assert(out(2).getAs[Double]("recon_err") ===
      (10.0 - (255.0 / 255.0 * 10.0)) * (10.0 - (255.0 / 255.0 * 10.0)))
  }

  test("int8 quantization codes stay in [-128, 127]") {
    import spark.implicits._
    val df = (0L until 50L).map(i =>
      (i, Seq((i * 37 % 101).toFloat - 50f, (i * 13 % 7).toFloat))).toDF("id", "vec")
    val out = Quantize.quantizeInt8(df, "id", "vec", dim = 2).collect()
    out.foreach { r =>
      r.getAs[Seq[Int]]("codes").foreach(c => assert(c >= -128 && c <= 127))
    }
  }
}
