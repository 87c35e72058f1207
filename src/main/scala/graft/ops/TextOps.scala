package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over a `documents(doc_id, text, lang, source,
  * n_chars)` table — the training-data-pipeline layer on top of the RDF
  * engine. Everything is pure Column expressions (whole-stage codegen, no
  * UDFs), so each operator scales to arbitrary input: a narrow projection +
  * one optional hash aggregation, no unbounded state.
  */
object TextOps {

  /** Whitespace tokens (split on \s+). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Token counting: whitespace tokens + a BPE-ish subword proxy (runs of
    * letters/digits of length<=4 after splitting longer words). */
  def tokenCounts(docs: DataFrame): DataFrame =
    // tokenize once into a named column: the n_subwords expression is a
    // higher-order function (CodegenFallback — no subexpression
    // elimination), so an inline split would run separately from
    // n_tokens' codegen'd split. CollapseProject keeps the projection
    // boundary (non-cheap expression, consumed twice).
    docs.select(col("doc_id"), col("text"), tokens(col("text")).as("__toks"))
      .select(
        col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        // BPE-ish proxy: ceil(len/4) subword units per token
        aggregate(
          transform(col("__toks"), w => ceil(length(w) / lit(4.0)).cast("long")),
          lit(0L), (acc, x) => acc + x).as("n_subwords"))

  /** Quality scoring: stopword ratio + mean word length (length/punct
    * families of heuristics). Tokenizes once into a named column — the
    * stopword `filter` is a higher-order function (CodegenFallback), so an
    * inline split would re-run interpreted inside it, separate from the
    * codegen'd splits of the other output columns. */
  def qualityScores(docs: DataFrame): DataFrame = {
    val toks = col("__toks")
    val nTok = size(toks).cast("double")
    // word characters = non-WHITESPACE (the same \s the tokenizer splits
    // on) — subtracting only literal spaces would count tabs/newlines as
    // word characters and inflate avg_word_len on newline-heavy web text
    val nWordChars =
      length(regexp_replace(col("text"), "\\s", "")).cast("double")
    docs.select(col("doc_id"), col("text"), tokens(col("text")).as("__toks"))
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(size(filter(toks, w => w === "the" || w === "a")) / nTok, 6).as("stopword_ratio"),
        round(nWordChars / nTok, 6).as("avg_word_len"))
  }

  /** Language-ID by stopword-marker counting (n-gram heuristic family):
    * argmax over per-language marker-token counts, ties broken by a fixed
    * language preference order.
    *
    * Evaluation shape: the whole expression is one CodegenFallback tree
    * (the marker counts are `filter` HOFs), and interpreted eval has no
    * subexpression elimination — a naive when-chain re-evaluates each
    * language's filter+split per comparison (up to ~12 tokenize passes per
    * row). Both the token array and the four scores are bound ONCE through
    * single-element `transform` wrappers (lambda parameters are bound
    * values), so one row costs one tokenize + four marker scans. */
  def predLang(text: Column): Column =
    element_at(transform(array(tokens(text)), toks =>
      predLangFromTokens(toks)), 1)

  /** [[predLang]] over an already-bound token array column. */
  def predLangFromTokens(toks: Column): Column = {
    def score(markers: String*): Column =
      size(filter(toks, w => markers.map(w === _).reduce(_ || _)))
    val scores = array(struct(
      score("the", "a").as("en"), score("le", "la").as("fr"),
      score("der", "die").as("de"), score("el", "los").as("es")))
    element_at(transform(scores, s => {
      val en = s.getField("en"); val fr = s.getField("fr")
      val de = s.getField("de"); val es = s.getField("es")
      when(en >= fr && en >= de && en >= es, "en")
        .when(fr >= de && fr >= es, "fr")
        .when(de >= es, "de")
        .otherwise("es")
    }), 1)
  }

  def langId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), predLang(col("text")).as("pred_lang"))

  /** The composed corpus-curation pipeline (the CCNet-shaped job a
    * training-data run actually executes): content-hash exact dedup over a
    * re-crawled web-page corpus -> language ID -> quality gates
    * (min token count, max stopword ratio) -> curated rows
    * (url, pred_lang, n_tokens, stopword_ratio).
    *
    * One plan: a single hash-aggregate shuffle (the dedup) then pure
    * Column projections and filters — at 100 TB the whole pipeline costs
    * one pass over the corpus plus one exchange on the content hash, and
    * Catalyst pushes the post-dedup filters to right after the aggregate.
    */
  def curate(pages: DataFrame, minTokens: Long = 20,
             maxStopwordRatio: Double = 0.2): DataFrame = {
    val toks = col("__toks")
    val nTok = size(toks).cast("long")
    val sw = size(filter(toks, w => w === "the" || w === "a")).cast("double") /
      nTok.cast("double")
    // all text-derived columns and both quality gates run BEFORE the dedup
    // exchange: rejected documents never shuffle, and the shuffle rows are
    // (hash, url, lang, 2 numerics) — tens of bytes — instead of the full
    // document text. The gates commute with content-hash dedup because
    // every metric is a pure function of the text.
    // Tokenize once into a named column: language-ID and the stopword gate
    // are HOF (CodegenFallback) expressions that would each re-split the
    // text interpreted if the split were inlined.
    val stats = pages
      .select(col("url"), col("text"), tokens(col("text")).as("__toks"))
      .select(md5(col("text")).as("h"), col("url"),
        predLangFromTokens(toks).as("pred_lang"),
        nTok.as("n_tokens"), sw.as("stopword_ratio"))
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio)
    // keeper = min(url); the other mins are no-ops (content-derived values
    // are identical within a group). String-valued min forces a
    // SortAggregate, but over the post-filter ~60-byte rows the per-row
    // sort cost is trivial next to the exchange it rides on.
    stats.groupBy("h")
      .agg(min(col("url")).as("url"), min(col("pred_lang")).as("pred_lang"),
        min(col("n_tokens")).as("n_tokens"),
        min(col("stopword_ratio")).as("stopword_ratio"))
      .select("url", "pred_lang", "n_tokens", "stopword_ratio")
  }

  /** In-document repetition signals (the Gopher/MassiveText "repetition
    * removal" rule family): fraction of duplicate word 2-grams and the
    * duplicate-token fraction. High values mark boilerplate/spam pages a
    * curation run drops before training. Pure Columns — one projection,
    * no shuffle, no UDF. */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    // Both the token array and the bigram array feed several output
    // metrics, and the bigram builder is a HOF (zip_with, CodegenFallback)
    // — inlining would re-tokenize and re-zip per metric reference. The
    // four counts are computed ONCE into a named struct column (bigrams
    // bound through a single-element transform wrapper inside it), and the
    // ratio projection reads struct fields. CollapseProject keeps the
    // boundary: the struct is non-cheap and consumed by every metric.
    val stats = transform(array(tokens(col("text"))), toks => {
      val n = size(toks)
      // word 2-grams via zip of the array with its own tail
      val bigrams = zip_with(slice(toks, lit(1), greatest(n - 1, lit(0))),
        slice(toks, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      val bi = transform(array(bigrams), bg =>
        struct(size(bg).as("nbi"), size(array_distinct(bg)).as("dbi")))
      struct(n.as("n"), size(array_distinct(toks)).as("dtok"),
        element_at(bi, 1).as("bi"))
    })
    val s = col("__s")
    val nBi = s.getField("bi").getField("nbi").cast("double")
    val dupBi = (s.getField("bi").getField("nbi") -
      s.getField("bi").getField("dbi")).cast("double")
    val dupTok = (s.getField("n") - s.getField("dtok")).cast("double")
    docs.select(col("doc_id"), element_at(stats, 1).as("__s"))
      .select(col("doc_id"),
        round(when(nBi > 0, dupBi / nBi).otherwise(0.0), 6).as("dup_bigram_frac"),
        round(dupTok / s.getField("n").cast("double"), 6).as("dup_token_frac"))
  }

  /** Word n-grams of a text column (space-joined), empty array when the
    * document has fewer than n tokens.
    *
    * The token array is BOUND ONCE per row through a single-element
    * `transform` wrapper before the per-position lambda references it.
    * Higher-order functions evaluate interpreted (no whole-stage codegen,
    * no common-subexpression elimination inside the lambda), so embedding
    * `split(text)` directly in the lambda body re-splits the text for
    * every `element_at` — n splits per position, ~n*tokens regex splits
    * per document. Measured on the 2.56M-page deployment table at n=8:
    * 525 s -> 20 s for the decontamination stage (BENCH.md). */
  def wordNgrams(text: Column, n: Int): Column = {
    val grams = transform(array(tokens(text)), toks => {
      val cnt = size(toks) - (n - 1)
      when(cnt >= 1,
        transform(sequence(lit(1), cnt),
          i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*)))
        .otherwise(array())
    })
    element_at(grams, 1)
  }

  /** Benchmark DECONTAMINATION: flag documents sharing any word n-gram
    * with a benchmark/eval corpus — the standard pre-training hygiene
    * check. Output: (doc_id, n_overlap, contaminated) for every document,
    * n_overlap = count of DISTINCT shared n-grams.
    *
    * Scale shape: the benchmark side is exploded to distinct n-grams and
    * BROADCAST (eval suites are tiny next to a 100 TB corpus); the corpus
    * side is one explode + a broadcast hash join + one count aggregation —
    * no corpus-side shuffle besides the per-doc count. */
  def decontaminate(docs: DataFrame, benchmark: DataFrame, n: Int = 3): DataFrame = {
    val docNg = explodedNgrams(docs.select(col("doc_id"), col("text")), n)
    val benchNg = explodedNgrams(benchmark.select(col("text")), n).distinct()
    val overlaps = docNg.join(broadcast(benchNg), "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    attachZeroOverlaps(docs, overlaps)
  }

  /** (carried columns…, ng) — one row per distinct word n-gram of `text`;
    * the shared corpus/benchmark projection of both decontamination
    * variants, so their n-gram semantics cannot drift apart. */
  private def explodedNgrams(df: DataFrame, n: Int): DataFrame =
    df.select(df.columns.filter(_ != "text").map(col) :+
      explode(array_distinct(wordNgrams(col("text"), n))).as("ng"): _*)

  /** Left-attach the (doc_id, n_overlap) rows back onto every document,
    * zero-filling the clean ones — the shared per-document epilogue of
    * both decontamination variants. */
  private def attachZeroOverlaps(docs: DataFrame, overlaps: DataFrame): DataFrame =
    docs.select(col("doc_id")).join(overlaps, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0).as("contaminated"))

  /** Decontamination for a benchmark set TOO BIG to broadcast exactly —
    * the 100-TB-regime variant of [[decontaminate]]. A full benchmark
    * suite's distinct n-gram set can run to 10^8 entries (gigabytes as an
    * exact broadcast set); a Bloom filter over the same keys at 1% FPR is
    * ~1.2 MB per million n-grams, so it still ships to every task like a
    * broadcast. The corpus side then drops ~99% of its n-grams BEFORE any
    * exchange, and only the surviving candidates pay the exact
    * (shuffle-merge, deliberately non-broadcast) verification join that
    * removes Bloom false positives — so the OUTPUT IS EXACT, byte-equal to
    * [[decontaminate]], while the shuffled bytes scale with the overlap,
    * not the corpus.
    *
    * Plan shape: benchmark n-grams are materialized once
    * (localCheckpoint — the filter build, the count, and the verify join
    * all read the same blocks instead of re-exploding the benchmark);
    * the filter itself is built distributed (per-partition filters merged
    * on the driver — benchmark-metadata-scale) over xxhash64 keys and
    * embedded as a binary literal under Spark's own codegen
    * `BloomFilterMightContain` — the exact expression Catalyst injects
    * for its runtime join filters, keyed the same way (putLong /
    * mightContainLong over xxhash64), reused here deliberately. Key
    * collisions in xxhash64 only ADD candidates; the verify join keeps
    * the result exact either way. */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame, n: Int = 3,
                         fpp: Double = 0.01): DataFrame =
    attachZeroOverlaps(docs, contaminationOverlapsBloom(docs, benchmark, n, fpp))

  /** The RESULT-scale core of [[decontaminateBloom]]: (doc_id, n_overlap)
    * for contaminated documents ONLY — the drop-set shape a pipeline
    * anti-joins against, with no corpus-wide left join to attach the
    * zero rows [[decontaminateBloom]]'s full per-document contract needs.
    *
    * Cache note: the benchmark n-gram set is materialized
    * (localCheckpoint) and its blocks back the returned LAZY frame, so
    * this convenience signature cannot release them — they live until the
    * session sweeps persisted RDDs. Benchmark sets are
    * benchmark-metadata-scale so one leak is small, but a long-lived
    * session decontaminating repeatedly should use
    * [[contaminationOverlapsBloomReleasable]] and call the handle once
    * everything derived from the result has materialized. */
  def contaminationOverlapsBloom(docs: DataFrame, benchmark: DataFrame,
                                 n: Int, fpp: Double = 0.01): DataFrame =
    contaminationOverlapsBloomReleasable(docs, benchmark, n, fpp)._1

  /** [[contaminationOverlapsBloom]] with an explicit release handle for
    * the benchmark n-gram checkpoint backing the returned frame — the
    * [[graft.pipeline.WebKg.fuzzyScoredTiers]] contract: call it ONLY
    * after every frame derived from the result has materialized.
    * Idempotent. */
  def contaminationOverlapsBloomReleasable(docs: DataFrame, benchmark: DataFrame,
                                           n: Int, fpp: Double = 0.01)
  : (DataFrame, () => Unit) = {
    import org.apache.spark.sql.GraftBridge
    val benchNg =
      explodedNgrams(benchmark.select(col("text")), n).distinct().localCheckpoint()
    val expected = benchNg.count()
    // zero-key benchmark: nothing can be contaminated, and Spark's
    // bloom_filter_agg returns a null buffer over zero rows (its readFrom
    // would NPE) — short-circuit to the empty overlap set; nothing derives
    // from the (empty) checkpoint, so its blocks release right here
    if (expected == 0L) {
      GraphAlgos.releaseLocalCheckpoint(benchNg)
      return (docs.select(col("doc_id"), lit(0L).as("n_overlap")).limit(0),
        () => ())
    }
    val bf = benchNg.select(xxhash64(col("ng")).as("k"))
      .stat.bloomFilter("k", expected, fpp)
    val bfBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = GraftBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftBridge.expression(lit(bfBytes)),
        GraftBridge.expression(xxhash64(col("ng")))))
    val docNg = explodedNgrams(docs.select(col("doc_id"), col("text")), n)
      .filter(mightContain)
    // exact verify join: shuffle_merge-hinted so AQE cannot re-broadcast a
    // benchmark table this variant exists to keep OFF the driver — only
    // Bloom-surviving candidate n-grams reach the exchange
    val overlaps = docNg.join(benchNg.hint("shuffle_merge"), "ng")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    (overlaps, () => GraphAlgos.releaseLocalCheckpoint(benchNg))
  }

  /** Vocabulary building: global top-k tokens with total occurrence count
    * and document frequency — the token-frequency table a tokenizer
    * training run starts from. One explode, one hash aggregation, then a
    * DISTRIBUTED top-k (TakeOrderedAndProject: per-partition heaps, no
    * global sort). The k-boundary tie is broken lexicographically so the
    * result set is deterministic across engines. */
  def topTokens(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(k)

  /** Document fingerprint: order-independent content hash over the sorted
    * distinct-token set (md5 so the fingerprint is reproducible across
    * engines and languages). */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(concat_ws(" ", array_sort(distinctTokens(col("text"))))).as("fp"))

  /** Deterministic 192+-char ASCII passage (no quotes/regex metachars)
    * shared by the `text_substring_dedup` query and its DuckDB oracle to
    * inject position-aligned cross-document duplicated blocks. */
  val testPassage: String =
    "SYNDICATED BOILERPLATE NOTICE: this exact paragraph was copied " +
    "verbatim onto every seventh page of the crawl so that its opening " +
    "sixty-four character blocks align at identical absolute positions " +
    "in each affected document and hash to shared block keys. "

  /** Email pattern shared by redaction and counting (kept simple enough
    * to behave identically under Java regex and RE2-family engines). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone-ish pattern: international prefix optional, 9+ digits with
    * common separators. */
  val phonePattern = "\\+?[0-9][0-9()\\s.-]{7,}[0-9]"

  /** PII redaction — the compliance stage of a web-scale training
    * pipeline: emails and phone-like numbers replaced by typed
    * placeholders, with per-document match counts for audit metrics.
    * Counts reflect what was ACTUALLY replaced: emails counted on the
    * raw text (they redact first), phones on the email-redacted text —
    * digits consumed into an `<EMAIL>` placeholder never masquerade as a
    * redacted phone in the audit numbers. Pure Column projections
    * (regexp_replace / regexp_extract_all), no shuffle, fully codegen'd.
    * Output: (doc_id, text, n_emails, n_phones). */
  def redactPii(docs: DataFrame): DataFrame = {
    val emailRedacted = regexp_replace(col("text"), emailPattern, "<EMAIL>")
    docs.select(
      col("doc_id"),
      regexp_replace(emailRedacted, phonePattern, "<PHONE>").as("text"),
      size(regexp_extract_all(col("text"), lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(emailRedacted, lit(phonePattern), lit(0))).as("n_phones"))
  }

  /** SUBSTRING-level duplicated-content measurement — the scalable cousin
    * of suffix-array substring dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): each text is cut into
    * NON-OVERLAPPING `w`-char blocks, block hashes are counted corpus-wide,
    * and each document reports what fraction of its blocked content occurs
    * more than once in the corpus. Unlike document-level dedup (misses
    * partial copies) or line-level dedup (misses copies that cross line
    * boundaries), this catches bulk copied passages embedded in
    * otherwise-unique pages — the dominant residual duplication mode in
    * web corpora after the other two stages run.
    *
    * Output: (doc_id, n_blocks, dup_blocks, dup_frac, keep) for EVERY
    * input document (docs shorter than one block get n_blocks=0,
    * dup_frac=0.0, keep=true); keep = dup_frac < maxDupFrac.
    *
    * Scale shape at 100 TB: stride = w, so the exploded block table is
    * exactly ONE copy of the corpus (overlapping shingles would be w
    * copies); the global occurrence count is a hash aggregation with
    * map-side combine — a million-times-copied template block collapses
    * to one row per task BEFORE the exchange; the count join back is a
    * shuffled equi-join whose build side is unique per key (one count row
    * per hash), so a hot block never multiplies rows and AQE can split
    * the probe side of a skewed partition. Both explode sides hash the
    * same frame, so the block exchange is reused at runtime (the
    * minhash-LSH pattern). All-ASCII-safe: Spark and DuckDB agree on
    * length()/substr() character semantics for the BMP text this runs on.
    */
  def substringDupStats(docs: DataFrame, w: Int = 64,
                        maxDupFrac: Double = 0.5): DataFrame = {
    val nb = (length(col("text")) / w).cast("int")
    val blocks = docs.select(col("doc_id"),
      explode(when(nb >= 1,
        transform(sequence(lit(0), nb - 1),
          i => md5(col("text").substr(i * w + lit(1), lit(w)))))
        .otherwise(array())).as("h"))
    val counts = blocks.groupBy("h").agg(count(lit(1)).as("c"))
    val perDoc = blocks.join(counts, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("dup_blocks"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("dup_blocks"), lit(0L)).as("dup_blocks"),
        round(when(col("n_blocks").isNull || col("n_blocks") === 0, 0.0)
          .otherwise(col("dup_blocks").cast("double") /
            col("n_blocks").cast("double")), 6).as("dup_frac"))
      .withColumn("keep", col("dup_frac") < maxDupFrac)
  }

  /** LM QUALITY SCORING — the CCNet-style "perplexity filter": score every
    * document by its per-token negative log-likelihood under a unigram
    * language model trained on a curated REFERENCE slice (CCNet trains
    * KenLM on Wikipedia; the unigram LM is the same filter family with the
    * same plan shape). Low NLL = looks like the reference corpus; high
    * NLL = gibberish, boilerplate, or the wrong language.
    *
    * Model: Laplace-smoothed unigram over reference whitespace tokens —
    * cost(w) = ln((T + V) / (cnt(w) + 1)) nats, where T = reference token
    * count, V = reference vocab size, cnt(w) = 0 for OOV.
    *
    * DETERMINISM (the reason for the integer detour): a per-document sum
    * of doubles over a shuffled groupBy is summation-order-dependent, so
    * re-runs and other engines could disagree in the last ulp. Instead the
    * per-token cost is quantized ONCE to integer micro-nats
    * (round(ln(..)*1e6) as long) and the per-document aggregation sums
    * longs — exact, associative, order-free. The only FP inputs are a
    * division of exact integers (correctly rounded, engine-identical) and
    * one ln per DISTINCT reference count (a handful of values; a libm
    * 1-ulp wobble lands on a round() boundary with probability ~1e-9).
    *
    * Scale shape at 100 TB: the reference LM is curated-corpus-sized, so
    * its count table BROADCASTs; the corpus side is one explode + a
    * broadcast LEFT join + one hash aggregation whose shuffle rows are
    * (doc_id, long, long) — the documents' text never re-shuffles. The two
    * scalars (T, V) are a metadata-scale driver aggregate over the
    * reference counts. Output: (doc_id, n_tokens, nll_per_token, keep)
    * with keep = nll_per_token <= maxNll. A document with ZERO tokens has
    * no per-token NLL and is ABSENT from the output (its explode emits no
    * rows) — a filtering caller that anti-joins the `!keep` rows therefore
    * KEEPS it, the conservative default for a gate that scores text
    * likeness (an empty text is a length-gate problem, not an LM one).
    */
  def lmScore(docs: DataFrame, reference: DataFrame,
              maxNll: Double = 9.0): DataFrame = {
    // eager checkpoint: the count table feeds BOTH the (T, V) scalar
    // aggregate below and the broadcast join — without it the reference
    // corpus is tokenized and aggregated twice (once for the head(), once
    // when the broadcast builds). The checkpoint is vocab-scale and backs
    // the returned frame (the repo's iterative-operator convention;
    // sessions release it via GraphAlgos.releaseLocalCheckpoint after
    // consuming the result).
    val counts = reference
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // T and V: metadata-scale (vocab-sized) aggregate, collected once
    val row = counts.agg(sum("c"), count(lit(1))).head()
    val denom = (if (row.isNullAt(0)) 0L else row.getLong(0)) + row.getLong(1)
    require(denom > 0, "lmScore: reference corpus is empty")
    val invProb = lit(denom.toDouble) /
      (coalesce(col("c"), lit(0L)) + lit(1L)).cast("double")
    val cost = round(log(invProb) * 1e6, 0).cast("long")
    val scored = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .join(broadcast(counts), Seq("w"), "left_outer")
      .select(col("doc_id"), cost.as("sc"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("sc")).cast("double") / 1e6 /
          count(lit(1)).cast("double"), 6).as("nll_per_token"))
    scored.withColumn("keep", col("nll_per_token") <= maxNll)
  }

  /** Corpus-wide LINE-level exact dedup — the C4/CCNet boilerplate-removal
    * primitive: a line of >= `minLen` chars survives only at its FIRST
    * corpus occurrence (smallest (doc_id, position)); shorter lines (menu
    * separators, blanks) pass through everywhere. Returns the rebuilt
    * documents as (doc_id, text, n_kept); documents whose every line was
    * removed disappear.
    *
    * SKEW-FREE at 100 TB by construction: the first occurrence per line is
    * a min(struct(doc_id, idx)) HASH AGGREGATION on the line hash —
    * map-side partial combine collapses a billion copies of a hot footer
    * line to one row per task before the exchange (a window
    * row_number over the hash would instead sort ALL copies in ONE
    * task). The winner set is then LEFT SEMI joined back on the full
    * (h, doc_id, idx) key — unique on both sides, so the join hashes
    * uniformly no matter how hot any single line is. Short lines never
    * enter the shuffle at all. */
  def lineDedup(docs: DataFrame, minLen: Int = 10): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
    val long = lines.filter(length(col("line")) >= minLen)
      .withColumn("h", md5(col("line")))
    val winners = long.groupBy("h")
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
      .select(col("h"), col("w.doc_id").as("doc_id"), col("w.idx").as("idx"))
    val keptLong = long.join(winners, Seq("h", "doc_id", "idx"), "left_semi")
      .drop("h")
    keptLong.unionByName(lines.filter(length(col("line")) < minLen))
      .groupBy("doc_id")
      .agg(
        concat_ws("\n",
          transform(array_sort(collect_list(struct(col("idx"), col("line")))),
            x => x("line"))).as("text"),
        count(lit(1)).as("n_kept"))
  }

  /** C4-style per-line RULE filter — the heuristic line cleaner the C4
    * pipeline (Raffel et al. 2020, §2.2 "Colossal Clean Crawled Corpus")
    * runs before any corpus-wide stage: a line survives only if it
    *
    *  1. ends in terminal punctuation (`.` `!` `?` or a closing quote),
    *  2. has at least `minWordsPerLine` whitespace words, and
    *  3. carries no boilerplate/code marker (the C4 rules: a `{`, the
    *     phrase "lorem ipsum", or the word "javascript", case-insensitive
    *     for the phrases).
    *
    * Unlike [[lineDedup]] (corpus-wide first-occurrence state) this is a
    * pure PER-DOCUMENT projection: one codegen'd pass, no explode, no
    * shuffle, trivially scale-free — the two compose as C4 does (rule
    * filter first, then corpus-level dedup over the surviving lines).
    *
    * Output: (doc_id, text = kept lines re-joined in order, n_kept,
    * n_dropped, keep = n_kept >= minKeptLines); a document whose every
    * line fails the rules keeps an empty text and keep=false rather than
    * disappearing, so callers can audit the drop set.
    *
    * Evaluation shape: the line array is split ONCE and bound through a
    * single-element `transform` wrapper (HOFs are CodegenFallback with no
    * subexpression elimination — the memory-documented N× pitfall); the
    * `filter` lambda references only its own lambda variable, so each
    * line is tested exactly once. */
  def c4LineFilter(docs: DataFrame, minWordsPerLine: Int = 3,
                   minKeptLines: Int = 1): DataFrame = {
    def keepLine(l: Column): Column =
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("lorem ipsum") &&
        !lower(l).contains("javascript") &&
        !l.contains("{")
    val stats = transform(array(split(col("text"), "\n")), ls =>
      struct(filter(ls, keepLine _).as("kept"), size(ls).as("n_lines")))
    val s = col("__s")
    docs.select(col("doc_id"), element_at(stats, 1).as("__s"))
      .select(col("doc_id"),
        concat_ws("\n", s.getField("kept")).as("text"),
        size(s.getField("kept")).cast("long").as("n_kept"),
        (s.getField("n_lines") - size(s.getField("kept")))
          .cast("long").as("n_dropped"))
      .withColumn("keep", col("n_kept") >= minKeptLines)
  }
}
