package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.WebKg

class TextOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false").getOrCreate()

  private def docs = {
    import spark.implicits._
    Seq(
      // doc 0: long English doc, low stopword ratio (1/9) -> kept
      (0L, ("the quick brown fox jumps over one lazy dog " * 3).trim, "en", "src1"),
      // doc 10: re-crawled (same content injected twice by synthesize) and
      // all-stopword -> deduped then rejected on stopword ratio
      (10L, ("the a " * 12).trim, "en", "src2"),
      // doc 2: too short -> rejected on min tokens
      (2L, "le petit chat", "fr", "src1"),
      // doc 3: long French doc -> kept as fr
      (3L, ("le grand chien noir " * 6).trim, "fr", "src3"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  test("curate: dedups re-crawls, applies language id and quality gates") {
    val pages = WebKg.synthesizeWebPages(docs, withDuplicates = true)
    // the duplicate injection really duplicated docs 0 and 10 (ids % 10 == 0)
    assert(pages.count() == 6)
    val rows = TextOps.curate(pages).collect()
    // doc 10 (stopword-heavy, duplicated) and doc 2 (short) are gone
    assert(rows.length == 2)
    val byUrl = rows.map(r => r.getAs[String]("url") -> r).toMap
    assert(byUrl.keySet == Set(
      "https://src1.example.org/doc/0", "https://src3.example.org/doc/3"))
    assert(byUrl("https://src1.example.org/doc/0").getAs[String]("pred_lang") == "en")
    assert(byUrl("https://src3.example.org/doc/3").getAs[String]("pred_lang") == "fr")
    assert(rows.forall(_.getAs[Long]("n_tokens") >= 20))
    assert(rows.forall(_.getAs[Double]("stopword_ratio") <= 0.2))
  }

  test("curate plan: one exchange, gates pushed below it, no text in shuffle") {
    // go through parquet so the plan is the real one (literal local data
    // gets folded by ConvertToLocalRelation, hiding the Filter node)
    val dir = java.nio.file.Files.createTempDirectory("graft_curate").toString
    docs.write.mode("overwrite").parquet(dir)
    val pages = WebKg.synthesizeWebPages(spark.read.parquet(dir),
      withDuplicates = true)
    val df = TextOps.curate(pages)
    df.collect() // finalize the adaptive plan
    // AQE's toString appends the pre-adaptive plan after "== Initial Plan ==";
    // audit only the executed final section
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, plan:\n$plan")
    // the quality gates and the stat projection run BEFORE the exchange
    // (printed tree is top-down, so upstream operators appear AFTER it):
    // shuffled rows carry (h, url, pred_lang, numerics), never the text
    val shuffleSide = plan.split("Exchange")(1)
    assert(shuffleSide.contains("Filter"),
      s"gates should be below the exchange:\n$plan")
    val postShuffle = plan.split("Exchange")(0)
    assert(!postShuffle.contains("split(text"),
      s"text-derived work should not run post-shuffle:\n$plan")
  }

  test("topTokens: counts, doc frequency, deterministic k-boundary") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b b c"),
      (2L, "b c d"),
      (3L, "c d e")).toDF("doc_id", "text")
    val top = TextOps.topTokens(df, 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // counts: b=3 c=3 d=2 a=1 e=1; ties broken lexicographically
    assert(top.toSeq == Seq(("b", 3L, 2L), ("c", 3L, 3L), ("d", 2L, 2L)))
  }

  test("repetitionSignals: duplicate bigram/token fractions, hand-checked") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b c"),   // bigrams: ab,ba,ab,bc -> 1 dup of 4; tokens 2 dup of 5
      (2L, "x"),           // no bigrams -> 0.0; no dup tokens
      (3L, "y y y y"))     // bigrams: yy,yy,yy -> 2 dup of 3; tokens 3 dup of 4
      .toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(df).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((0.25, 0.4)))
    assert(got(2L) == ((0.0, 0.0)))
    assert(got(3L) == ((math.rint(2.0 / 3 * 1e6) / 1e6, 0.75)))
  }

  test("decontaminate: flags docs sharing 3-grams with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),   // shares "quick brown fox"
      (2L, "entirely unrelated content words"),
      (3L, "short"),                            // < 3 tokens: no ngrams
      (4L, "quick brown fox quick brown fox"))  // distinct overlap counted once+
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a quick brown fox ran")).toDF("doc_id", "text")
    val got = TextOps.decontaminate(corpus, bench, 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got(1L) == ((1L, true)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false)))
    // doc 4's distinct 3-grams: {qbf, bfq, fqb} -> only "quick brown fox" shared
    assert(got(4L) == ((1L, true)))
    // plan: benchmark side broadcast, no corpus-side shuffle before the join
    val plan = TextOps.decontaminate(corpus, bench, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("decontaminateBloom: byte-equal to exact decontaminate; bloom + merge plan") {
    import spark.implicits._
    // 60 docs with overlapping trigram families + a benchmark slice, plus
    // a degenerate fpp to force Bloom false positives through the exact
    // verify join — the output must STILL match the exact operator
    val corpus = (0 until 60).map { i =>
      (i.toLong, s"alpha w$i beta w${i % 7} gamma token${i % 5} delta end$i")
    }.toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") % 9 === 0)
    for (fpp <- Seq(0.01, 0.5)) {
      val got = TextOps.decontaminateBloom(corpus, bench, 3, fpp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val exact = TextOps.decontaminate(corpus, bench, 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got == exact, s"fpp=$fpp")
    }
    // empty benchmark: nothing contaminated, no crash on the 0-key filter
    val none = TextOps.decontaminateBloom(corpus, corpus.limit(0), 3).collect()
    assert(none.length == 60 && none.forall(!_.getBoolean(2)))
    // plan shape: the corpus side is prefiltered by Spark's own codegen
    // might_contain BEFORE any exchange, and the exact verify join is
    // SortMergeJoin (never a benchmark broadcast — the regime this
    // variant exists for)
    val plan = TextOps.decontaminateBloom(corpus, bench, 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("SortMergeJoin"), plan)
  }

  test("contaminationOverlapsBloomReleasable frees the benchmark checkpoint") {
    import spark.implicits._
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.getPersistentRDDs.values.foreach(_.unpersist(true))
    val corpus = (0 until 40).map { i =>
      (i.toLong, s"alpha w$i beta w${i % 7} gamma token${i % 5} delta")
    }.toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") % 9 === 0)
    val (ov, release) =
      TextOps.contaminationOverlapsBloomReleasable(corpus, bench, 3)
    // the benchmark n-gram checkpoint is live while the lazy result needs it
    assert(sc.getPersistentRDDs.nonEmpty)
    val drop = ov.localCheckpoint()
    assert(drop.count() > 0)
    val before = sc.getPersistentRDDs.size
    release()
    // the handle released exactly the benchmark block; the caller's own
    // drop-set checkpoint survives and stays readable
    assert(sc.getPersistentRDDs.size == before - 1,
      s"census $before -> ${sc.getPersistentRDDs.size}")
    assert(drop.count() > 0)
    graft.ops.GraphAlgos.releaseLocalCheckpoint(drop)
  }

  test("predLang ties break by preference order") {
    import spark.implicits._
    val df = Seq("nothing matches here").toDF("text")
    assert(df.select(TextOps.predLang(col("text"))).head().getString(0) == "en")
  }
  test("substringDupStats counts position-aligned duplicated blocks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "AAAAAAAABBBBBBBB"), // blocks AAAAAAAA + BBBBBBBB
      (2L, "AAAAAAAACCCCCCCC"), // blocks AAAAAAAA + CCCCCCCC
      (3L, "short"),            // < one block -> zero-block row survives
      (4L, "AAAAAAAABB")        // one full block, 2-char tail dropped
    ).toDF("doc_id", "text")
    val out = TextOps.substringDupStats(docs, w = 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5, false))) // keep is STRICT <
    assert(out(2L) == ((2L, 1L, 0.5, false)))
    assert(out(3L) == ((0L, 0L, 0.0, true)))
    assert(out(4L) == ((1L, 1L, 1.0, false)))
    // a constant SUFFIX does NOT create shared blocks unless prefix
    // lengths align: block boundaries are absolute positions
    val suffixed = Seq((1L, "X" * 3 + "S" * 8), (2L, "Y" * 5 + "S" * 8))
      .toDF("doc_id", "text")
    val s = TextOps.substringDupStats(suffixed, w = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(s(1L) == 0L && s(2L) == 0L)
    // skew-free shape: global block counting is an aggregation, never a
    // window over the block hash
    val plan = TextOps.substringDupStats(docs, w = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("lineDedup keeps first corpus occurrence; short lines pass through") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique first line one\nshared boilerplate footer line\n--"),
      (2L, "unique second line two\nshared boilerplate footer line\n--"),
      (3L, "shared boilerplate footer line")).toDF("doc_id", "text")
    val out = TextOps.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 keeps everything (first occurrence of the footer)
    assert(out(1L) == (("unique first line one\nshared boilerplate footer line\n--", 3L)))
    // doc 2 loses the footer but keeps its unique line and the short "--"
    assert(out(2L) == (("unique second line two\n--", 2L)))
    // doc 3 was ONLY the footer -> disappears entirely
    assert(!out.contains(3L))
    // skew-free shape: first-occurrence selection is an aggregation +
    // unique-key semi-join — NO window operator anywhere in the plan (a
    // window partitioned by the line hash would sort every copy of a hot
    // boilerplate line in one task)
    val plan = TextOps.lineDedup(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("lmScore matches a sequential unigram-NLL reference; broadcast plan") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the log"),
      (3L, "zzz qqq xxx vvv kkk"), // all-OOV gibberish -> highest NLL
      (4L, "the cat and the dog"),
      (5L, "cat dog mat log sat")).toDF("doc_id", "text")
    val reference = corpus.filter(col("doc_id") <= 2) // the "curated" slice
    val out = TextOps.lmScore(corpus, reference, maxNll = 2.5).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))).toMap

    // independent sequential reference implementation
    val refToks = Seq("the cat sat on the mat", "the dog sat on the log")
      .flatMap(_.split("\\s+"))
    val cnt = refToks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val denom = (refToks.size + cnt.size).toDouble
    def nll(text: String): (Long, Double) = {
      val toks = text.split("\\s+")
      val sum = toks.map(w => math.round(
        math.log(denom / (cnt.getOrElse(w, 0L) + 1L).toDouble) * 1e6)).sum
      (toks.length.toLong,
        BigDecimal(sum / 1e6 / toks.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    for ((id, text) <- Seq(1L -> "the cat sat on the mat",
        2L -> "the dog sat on the log", 3L -> "zzz qqq xxx vvv kkk",
        4L -> "the cat and the dog", 5L -> "cat dog mat log sat")) {
      val (n, score) = nll(text)
      assert(out(id)._1 == n, s"doc $id n_tokens")
      assert(out(id)._2 == score, s"doc $id nll")
      assert(out(id)._3 == (score <= 2.5), s"doc $id keep")
    }
    // in-LM docs score lower than the all-OOV doc, which must be dropped
    assert(out(1L)._2 < out(3L)._2 && !out(3L)._3 && out(1L)._3)
    // scale shape: the LM count table joins BROADCAST — the corpus side
    // must not sort-merge against the vocabulary
    val plan = TextOps.lmScore(corpus, reference)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("c4LineFilter: terminal punct, min words, markers; shuffle-free plan") {
    import spark.implicits._
    val in = Seq(
      // every rule in one doc: sentence kept; menu (1 word) dropped;
      // javascript marker dropped; brace dropped; question kept
      (1L, "A real sentence with words.\nmenu\n" +
        "Enable javascript to view.\nvar x = { a: 1 };\nIs this kept? Yes?"),
      // all-bad doc: survives as an auditable keep=false row, empty text
      (2L, "short\n{ banner }"),
      // lorem ipsum is case-insensitive; closing-quote punctuation counts
      (3L, "Lorem IPSUM dolor sit amet.\nHe said \"this stays.\"")
    ).toDF("doc_id", "text")
    val out = TextOps.c4LineFilter(in).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("text") ==
      "A real sentence with words.\nIs this kept? Yes?")
    assert(out(1L).getAs[Long]("n_kept") == 2 &&
      out(1L).getAs[Long]("n_dropped") == 3)
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[String]("text") == "" &&
      out(2L).getAs[Long]("n_kept") == 0 && !out(2L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[String]("text") == "He said \"this stays.\"")
    // per-document projection: no exchange anywhere in the plan
    val plan = TextOps.c4LineFilter(in).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

}
