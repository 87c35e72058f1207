package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Iri, Skolem, Vocab}
import graft.engine.Terms

/** The knowledge-graph construction pipeline over an Iceberg-style web-page
  * table `(url, warc_ts, html, text, lang)` (BASELINE.json input_hint):
  * per-document triple extraction -> skolemization -> canonicalization ->
  * dedup -> entity linking -> materialization.
  *
  * Everything up to dedup is a narrow, per-row projection (no shuffle);
  * dedup is one hash-aggregate shuffle on the triple key; entity linking is
  * an explode + broadcast join. At 1000 executors the plan has exactly two
  * wide edges (dedup, link-aggregate), both on well-distributed keys, with
  * `source`-derived domains as the natural partition pruning axis.
  */
object WebKg {

  val vocab = "http://graft.dev/vocab#"
  val docNs = "http://graft.dev/doc/"
  val entityNs = "http://graft.dev/entity/"
  val pType: String = Vocab.rdfType
  val pTitle = vocab + "title"
  val pLang = vocab + "lang"
  val pLink = vocab + "links"
  val pCreated = vocab + "created"
  val pTextHash = vocab + "textSha"
  val pMentions = vocab + "mentions"
  val cWebPage = vocab + "WebPage"

  /** Deterministic corpus replication for scale runs: each source row
    * becomes `k` rows with distinct doc_ids (doc_id*k + i) — unique urls,
    * same text distribution. Pure Column ops, no data files. */
  def replicateDocs(docs: DataFrame, k: Int): DataFrame = {
    // parallelism comes from the range side (numSlices partitions), so the
    // replicated corpus is born parallel — no repartition shuffle needed.
    // Partition count scales with CORES (3 waves' slack), not with k: a
    // fixed 512 partitions meant 512 tiny tasks at every core count, and
    // the driver-side scheduling of them is a SERIAL cost that caps
    // measured scaling (~4s/run at 2 cores); a real cluster also sizes
    // task counts to executors, not to the replication factor
    val spark = docs.sparkSession
    val parts = math.min(math.max(spark.sparkContext.defaultParallelism * 3, 4), k)
    spark.range(0, k, 1, parts).crossJoin(broadcast(docs))
      .select((col("doc_id") * k + col("id")).as("doc_id"),
        col("text"), col("lang"), col("source"), col("n_chars"))
  }

  /** Deterministic synthetic web-page table derived from the `documents`
    * corpus (seeded by doc_id; no external data): skewed domains via
    * `source`, 10% title-less pages, ~10% duplicate re-crawls, relative
    * links, multi-language. Pure Column expressions -> reproducible on any
    * engine, byte-for-byte. */
  def synthesizeWebPages(docs: DataFrame, withDuplicates: Boolean = false): DataFrame = {
    val base = docs.select(
      concat(lit("https://"), col("source"), lit(".example.org/doc/"),
        col("doc_id")).as("url"),
      expr("TIMESTAMP '2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")
        .as("warc_ts"),
      concat(
        lit("<html><head><title>"),
        when(pmod(col("doc_id"), lit(10)) === 9, lit(""))
          .otherwise(concat(lit("Doc "), col("doc_id"))),
        lit("</title></head><body><p>"), col("text"),
        lit("</p><a href=\"/doc/"), pmod(col("doc_id") * 7 + 1, lit(100000)),
        lit("\">next</a></body></html>")).cast("binary").as("html"),
      col("text"), col("lang"))
    if (!withDuplicates) base
    // re-crawl duplicates: same url, same content (idempotent extraction).
    // Emitted via explode so the source is scanned ONCE, not per-branch.
    else base.withColumn("__copy", explode(
        when(element_at(split(col("url"), "/"), -1).cast("long") % 10 === 0,
          sequence(lit(0), lit(1))).otherwise(sequence(lit(0), lit(0)))))
      .drop("__copy")
  }

  private def htmlStr: Column = col("html").cast("string")

  /** Text extraction from html: the content of the <p> body region. The
    * per-row invariant (BASELINE.json): byte-identical extracted text per
    * url — extractedText(synthesizeWebPages(d)) == d.text.
    *
    * These regex Columns are the REFERENCE implementation (and the spec for
    * the invariant query); the pipeline itself extracts via `htmlParts`, a
    * custom codegen expression doing all three fields in one scan —
    * byte-parity between the two is asserted in WebKgSpec/HtmlPartsSpec. */
  def extractedText: Column = regexp_extract(htmlStr, "<p>(.*)</p>", 1)

  def extractedTitle: Column = regexp_extract(htmlStr, "<title>([^<]*)</title>", 1)

  def extractedHref: Column = regexp_extract(htmlStr, "href=\"([^\"]*)\"", 1)

  /** struct(title, href, text) in one codegen'd pass over the html — the
    * per-byte cost center of the 100 TB extraction job (three regex scans
    * collapsed into one index scan). */
  def htmlParts(html: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(
      graft.expressions.HtmlParts(GraftBridge.expression(html.cast("string"))))
  }

  private val resolveUdf = udf((ref: String, base: String) => Iri.resolve(ref, base))

  /** IRI resolution with a codegen fast path: absolute refs and
    * root-relative refs (the overwhelming majority of web hrefs) resolve as
    * pure Column expressions; everything else falls back to the full
    * RFC 3986 §5.2 UDF. Keeps whole-stage codegen on the hot path. */
  def resolveHref(ref: Column, base: Column): Column = {
    val origin = regexp_extract(base, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    when(ref.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), ref)
      // "/." routes to the UDF: RFC 3986 dot-segment removal ("/../x",
      // "/a/./b") is not a plain concat
      .when(ref.startsWith("/") && !ref.startsWith("//") &&
          !ref.contains("/.") && origin =!= "",
        concat(origin, ref))
      .otherwise(resolveUdf(ref, base))
  }

  /** Per-document triple extraction: web pages -> flat (s, p, o) string
    * triples (the oracle-comparable projection; `extractTriples` lifts the
    * same rows to term structs). ONE scan of the page table: all predicates
    * are built into an array and exploded — the flatMap shape — instead of
    * one union branch (= one scan) per predicate. No shuffle; the only UDF
    * is IRI resolution. */
  def extractFlat(pages: DataFrame): DataFrame = {
    def po(p: String, o: Column) = struct(lit(p).as("p"), o.as("o"))
    // stage 1 runs the one-pass HtmlParts scan exactly once per row; stage 2
    // fans the fields out into the exploded predicate array
    pages.select(col("url").as("s"), htmlParts(col("html")).as("__hp"),
        col("lang"), col("warc_ts"))
      .select(col("s"), explode(array(
        po(pType, lit(cWebPage)),
        po(pTitle, when(col("__hp.title") =!= "", col("__hp.title"))),
        po(pLang, col("lang")),
        // a page with no <a href> emits NO links triple: RFC 3986 resolves
        // the empty reference to the base itself, which would fabricate a
        // self-link for every link-less page
        po(pLink, when(col("__hp.href") =!= "",
          resolveHref(col("__hp.href"), col("s")))),
        po(pCreated, utcDateTime(col("warc_ts"))),
        po(pTextHash, md5(col("__hp.text"))))).as("po"))
      .select(col("s"), col("po.p").as("p"), col("po.o").as("o"))
      .filter(col("o").isNotNull)
  }

  /** The UTC instant of a timestamp column as an xsd:dateTime lexical —
    * rendered from the UTC wall clock regardless of the session timezone
    * (date_format alone renders in the SESSION zone, which would mislabel
    * the instant under any non-UTC session while still stamping 'Z'). */
  private[pipeline] def utcDateTime(ts: Column): Column =
    date_format(convert_timezone(lit("UTC"), ts), "yyyy-MM-dd'T'HH:mm:ss'Z'")

  /** Term-struct extraction: same statements as extractFlat but typed —
    * IRIs for type/link objects, xsd:string/xsd:dateTime literals. Single
    * scan + explode, like extractFlat; null lang/warc_ts drop their
    * statement (a struct whose VALUE is null would be a malformed term,
    * invisible to the o.isNotNull filter). */
  def extractTriples(pages: DataFrame): DataFrame = {
    def po(p: String, o: Column) = struct(Terms.iri(lit(p)).as("p"), o.as("o"))
    val nullTerm = lit(null).cast(Terms.termSchema)
    pages.select(col("url"), htmlParts(col("html")).as("__hp"),
        col("lang"), col("warc_ts"))
      .select(Terms.iri(col("url")).as("s"), explode(array(
        po(pType, Terms.iri(lit(cWebPage))),
        po(pTitle, when(col("__hp.title") =!= "", Terms.strLit(col("__hp.title")))
          .otherwise(nullTerm)),
        po(pLang, when(col("lang").isNotNull, Terms.strLit(col("lang")))
          .otherwise(nullTerm)),
        po(pLink, {
          val r = when(col("__hp.href") =!= "",
            resolveHref(col("__hp.href"), col("url")))
          when(r.isNotNull, Terms.iri(r)).otherwise(nullTerm)
        }),
        po(pCreated, {
          val d = utcDateTime(col("warc_ts"))
          when(d.isNotNull, Terms.typedLit(d, Vocab.xsdDateTime))
            .otherwise(nullTerm)
        }),
        po(pTextHash, {
          val h = md5(col("__hp.text"))
          when(h.isNotNull, Terms.strLit(h)).otherwise(nullTerm)
        }))).as("po"))
      .select(col("s"), col("po.p").as("p"), col("po.o").as("o"))
      .filter(col("o").isNotNull)
  }

  /** Set-semantic graph: the reference's triple stores dedup on insert
    * (description.ex:135-152) — in Spark that is one hash aggregate on the
    * full triple key (AQE handles skewed predicates). */
  def dedupTriples(triples: DataFrame): DataFrame = triples.dropDuplicates()

  /** Lift FLAT string triples (the store projection written by
    * [[extractFlat]] + the canonicalize/link stages) to the typed
    * term-struct shape [[extractTriples]] emits — the input contract of
    * the SPARQL engine and the graph API. Pure per-row projection, no
    * shuffle. The flat projection is lossless for this vocabulary: the
    * IRI-valued predicates are a closed set and the only non-string
    * literal is `created`'s xsd:dateTime (same dispatch as
    * [[canonicalizeFlat]]'s IRI-position set). */
  def termsFromFlat(flat: DataFrame): DataFrame = {
    val oIsIri = col("p").isin(pType, pLink, pMentions)
    flat.select(
      Terms.iri(col("s")).as("s"),
      Terms.iri(col("p")).as("p"),
      when(oIsIri, Terms.iri(col("o")))
        .when(col("p") === pCreated,
          Terms.typedLit(col("o"), Vocab.xsdDateTime))
        .otherwise(Terms.strLit(col("o"))).as("o"))
  }

  private val pctNormUdf = udf((s: String) => Iri.normalizePercentEncoding(s))

  /** The north star's RDF 1.1 canonicalization stage over FLAT string
    * triples: percent-encoding normalization of every IRI position
    * (pct-triplets uppercased, unreserved octets decoded — RFC 3986 §6.2.2
    * via [[Iri.normalizePercentEncoding]]) as a narrow per-row pass, no
    * shuffle. Codegen fast path: rows without a '%' (the overwhelming
    * majority of web urls) never leave whole-stage codegen; only
    * pct-bearing IRIs hit the UDF. Literal objects pass through untouched —
    * extraction already emits canonical lexical forms (xsd:dateTime via
    * date_format, md5 hex). Blank nodes cannot occur here: `extractFlat`
    * emits skolemized IRI identity by construction (the north star replaces
    * bnodes with salted 128-bit hashes); TERM graphs with bnodes
    * canonicalize via [[graft.engine.Graphs.canonicalizeDataset]] /
    * `canonicalizePerGroup`. */
  def canonicalizeFlat(triples: DataFrame): DataFrame = {
    def norm(c: Column) = when(c.contains("%"), pctNormUdf(c)).otherwise(c)
    val oIsIri = col("p").isin(pType, pLink, pMentions)
    triples
      .withColumn("s", norm(col("s")))
      .withColumn("o", when(oIsIri, norm(col("o"))).otherwise(col("o")))
  }

  /** URL canonicalization for DEDUP KEYING — the normalization a web
    * pipeline applies before snapshot/dedup so trivially-variant URLs of
    * the same resource collapse to one key: a crawl sees
    * `HTTP://Host/p#frag`, `http://host:80/p`, and `http://host/p?utm_x=1`
    * as three different strings for one page, and a raw-url snapshot
    * would keep all three. Steps (RFC 3986 §6.2 syntax-based
    * normalization for case and default ports, plus the standard
    * tracking-param strip):
    *
    *  1. drop the fragment (never sent to the server),
    *  2. lowercase the scheme and HOST (the two case-insensitive
    *     components per RFC 3986 §6.2.2.1; userinfo, path, and query case
    *     is preserved — it is significant),
    *  3. drop the scheme's default port (:80 http, :443 https),
    *  4. within the QUERY component only (first `?` onward — a literal
    *     `&` in the path is a valid path character and is never touched):
    *     drop tracking params (utm_*, gclid, fbclid) and collapse the
    *     separator artifacts the strip leaves.
    *
    * Pure codegen regexp Columns — no shuffle, no UDF — and every pattern
    * is RE2-compatible AND either anchored or a separator-run collapse, so
    * Spark's always-global regexp_replace and the DuckDB oracle's
    * per-pattern flags produce the byte-identical chain
    * (`kg_url_normalize`). Strings without a `scheme://` prefix pass
    * through untouched. Percent-encoding normalization is the
    * `--canonicalize` stage's job ([[canonicalizeFlat]]), deliberately not
    * repeated here. */
  def normalizeUrl(u: Column): Column = {
    // FAST PATH: a url already in canonical shape (lowercase http(s)
    // scheme+host, no userinfo/port/query/fragment) is a fixed point of
    // the whole chain — one rlike instead of twelve regex ops. On a
    // mostly-canonical crawl this is nearly every row (measured on the
    // all-canonical 2.8M-page table: the unguarded chain cost +5.9 s
    // (~2.1 µs/url) end-to-end; guarded, the stage is below measurement
    // noise — BENCH.md).
    val canonicalShape = u.rlike("^https?://[a-z0-9.-]+(/[^?#]*)?$")
    when(canonicalShape, u).otherwise(normalizeUrlFull(u))
  }

  private[pipeline] def normalizeUrlFull(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    // decompose: scheme :// [userinfo@] host[:port] rest — lowercase only
    // scheme and host; userinfo keeps its case (RFC 3986 §3.2.1)
    val scheme = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val userinfo = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*@)", 1)
    val hostPort = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#]*@)?([^/?#@]*)", 1)
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val lowered = concat(lower(scheme), lit("://"), userinfo,
      lower(hostPort), rest)
    val noPort = regexp_replace(
      regexp_replace(lowered,
        "^(http://(?:[^/?#]*@)?[^/?#:]*):80([/?]|$)", "$1$2"),
      "^(https://(?:[^/?#]*@)?[^/?#:]*):443([/?]|$)", "$1$2")
    // query-scoped tracking strip: split at the FIRST '?' (the query
    // delimiter — the path cannot contain '?'), clean only the query
    val base = regexp_replace(noPort, "\\?.*", "")
    val q0 = regexp_extract(noPort, "(\\?.*)", 1)
    val q1 = regexp_replace(q0,
      "([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*", "$1")
    val q2 = regexp_replace(q1, "&&+", "&")   // separator runs mid-query
    val q3 = regexp_replace(q2, "^\\?&+", "?") // leading strip artifact
    val q4 = regexp_replace(q3, "[?&]+$", "")  // trailing separators
    // no scheme:// prefix -> not a URL -> fully untouched (not even the
    // fragment strip applies)
    when(scheme === "", u).otherwise(concat(base, q4))
  }

  /** RE-CRAWL snapshot selection: keep the NEWEST crawl of every url —
    * the first thing a pipeline over a continuously re-crawled web table
    * runs before extraction (the north star's 10% re-crawl duplicates).
    * A max_by AGGREGATION on the url key (ties broken by the larger,
    * then lexicographically larger, html payload — deterministic).
    * Output: the input schema, one row per url.
    *
    * Why an aggregate and not a rank-1 window: the win is PARTIAL
    * (map-side) combine — re-crawl versions collapse within each input
    * split before the exchange, and only one surviving row per (split,
    * url) crosses the wire, where a url-partitioned row_number window
    * shuffles EVERY version's full payload. (The struct-valued max_by
    * buffer does plan as SortAggregate, so a sort of the surviving rows
    * remains — the measured 2x end-to-end gain on a 2.56M-page run comes
    * from the combine, not from eliminating sorting.) With url-bucketed
    * page storage the exchange disappears entirely. */
  def latestSnapshot(pages: DataFrame): DataFrame = {
    val cols = pages.columns.toSeq
    val key = struct(col("warc_ts"), length(col("html")), col("html"))
    pages.groupBy("url")
      .agg(max_by(struct(cols.map(col): _*), key).as("__w"))
      .select(cols.map(c => col(s"__w.$c").as(c)): _*)
  }

  /** DOMAIN-level curation stats — the domain-reputation stage real web
    * pipelines run between crawling and document-level filtering
    * (RefinedWeb/Dolma-style blocklisting by host): pages are aggregated
    * by registered host into (n_pages, n_unique content hashes, re-crawl
    * dup_rate, avg_tokens, notitle_rate) with a keep flag — a domain
    * whose pages are mostly mutual copies or mostly empty-titled stubs
    * is dropped wholesale, cheaper and earlier than judging each of its
    * pages alone. The title signal is derived from the HTML itself
    * (`extractedTitle`), not from metadata, so the stat composes the
    * extraction path with the aggregation path.
    *
    * Scale shape at 100 TB: per-page signals are pure pre-shuffle Columns
    * (the shuffle rows are a host plus four numerics, never text or
    * html); the aggregation is one exchange on the domain key. The
    * count-distinct plans as Spark's two-phase distinct-aggregate expand
    * — partials combine on (domain, hash), so even a single hot domain
    * spreads across tasks by content hash and cannot serialize in one
    * task. Output is domain-cardinality (metadata scale next to the
    * corpus): feed `keep` back as a broadcast/shuffled semi-join to
    * filter the page table.
    *
    * Host parsing: the host is whatever follows `http(s)://` up to the
    * first `/` OR end-of-string (path-less homepage URLs count toward
    * their real host). URLs with no http(s) scheme at all parse to the
    * `''` pseudo-domain — one mixed group of unattributable pages, NOT a
    * real host; callers acting on `keep` should pass `''` through rather
    * than wholesale-drop it (PipelineMain's --domain-curation does). */
  /** The url's host as curation's domain key — ONE definition shared by
    * [[domainStats]] and the deployment keep-set join (two copies of the
    * regex could drift and silently empty the semi-join). Non-http(s)
    * urls parse to the `''` pseudo-domain. */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^https?://([^/]+)", 1)

  def domainStats(pages: DataFrame, maxDupRate: Double = 0.25,
                  minAvgTokens: Double = 5.0,
                  maxNotitleRate: Double = 0.5): DataFrame = {
    val perPage = pages.select(
      urlHost(col("url")).as("domain"),
      md5(col("text")).as("h"),
      size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
      (extractedTitle === "").cast("int").as("notitle"))
    perPage.groupBy("domain")
      .agg(count(lit(1)).as("n_pages"),
        countDistinct(col("h")).as("n_unique"),
        round(avg(col("n_tokens")), 6).as("avg_tokens"),
        round(avg(col("notitle")), 6).as("notitle_rate"))
      .select(col("domain"), col("n_pages"), col("n_unique"),
        round(lit(1.0) - col("n_unique").cast("double") /
          col("n_pages").cast("double"), 6).as("dup_rate"),
        col("avg_tokens"), col("notitle_rate"))
      .withColumn("keep",
        col("dup_rate") <= maxDupRate && col("avg_tokens") >= minAvgTokens &&
          col("notitle_rate") <= maxNotitleRate)
  }

  /** Entity linking, stage 2 (score & resolve): mention tokens broadcast-
    * joined against an entity dictionary. Stage-1 candidate blocking at
    * corpus scale is Dedup.minhashLshCandidates on surface forms. Output:
    * (s, p, o) mention triples, one per (document, entity) with count>=1. */
  def entityLink(docs: DataFrame, dictionary: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = dictionary.toDF("surface", "entity")
    docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .join(broadcast(dict), col("w") === col("surface"))
      .groupBy(col("doc_id"), col("entity")).agg(count(lit(1)).as("n_mentions"))
      .select(concat(lit(docNs), col("doc_id")).as("s"),
        lit(pMentions).as("p"), col("entity").as("o"), col("n_mentions"))
  }

  /** Default dictionary: TPC-ish corpus words -> entity IRIs. */
  val defaultDictionary: Seq[(String, String)] =
    Seq("customer", "part", "order", "supplier", "spark", "vector")
      .map(w => w -> (entityNs + w))

  /** Character 3-gram shingles of a string column (distinct). */
  private def shinglesOf(c: Column): Column =
    array_distinct(transform(sequence(lit(1), length(c) - 2),
      i => c.substr(i, lit(3))))

  private def shingles(c: String): Column = shinglesOf(col(c))

  /** The two LSH band rows of a short string, computed ROW-LOCALLY: the
    * four minhash lanes are `array_min` over the shingle set (min over md5
    * hex strings — the same lexicographic min the old exploded groupBy
    * aggregation computed), paired into two band signatures. The shingle
    * set is bound ONCE through the single-element `transform` wrapper
    * (HOFs are CodegenFallback with no subexpression elimination — the
    * measured N× pitfall); each lane is then referenced exactly once by
    * its band md5. Shingle sets here are tiny (a k-char token has k-2
    * 3-grams), so the interpreted per-element cost is noise while the
    * explode relation + 4-min aggregation shuffle the old shape paid per
    * side disappears outright (guide §2.4). */
  private def rowShingleBands(c: Column): Column = {
    def lane(gs: Column, i: Int) =
      array_min(transform(gs, g => md5(concat(lit(s"$i:"), g))))
    element_at(transform(array(shinglesOf(c)), gs =>
      array(
        struct(lit(0).as("band"), md5(concat(lane(gs, 0), lane(gs, 1))).as("sig")),
        struct(lit(1).as("band"), md5(concat(lane(gs, 2), lane(gs, 3))).as("sig")))), 1)
  }

  /** Entity linking, FULL two-stage (the north star's "batched mention
    * detection with entity-link scoring": blocked candidate generation by
    * minhash over character 3-gram shingles, then exact-Jaccard
    * score-and-resolve against the broadcast dictionary). Unlike
    * `entityLink` (exact surface match) this links fuzzy mentions —
    * misspellings and variants whose shingle Jaccard clears `threshold`.
    *
    * Plan shape at corpus scale: DISTINCT residual tokens (vocabulary
    * scale, never mentions) are blocked against the (tiny, broadcast)
    * dictionary band table — no all-pairs token×surface comparison; the
    * verify stage joins candidate pairs to their shingle SETS (bounded by
    * token length) and scores per pair with array_intersect.
    * Output: (s, p, o=entity, n_mentions, top_jac). */
  def entityLinkFuzzy(docs: DataFrame, dictionary: Seq[(String, String)],
                      threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    entityLinkFuzzyDF(docs, dictionary.toDF("surface", "entity"), threshold,
      broadcastDict = true)
  }

  /** [[entityLinkFuzzy]] with the dictionary as a DataFrame and an
    * explicit distribution choice. `broadcastDict = true` is the
    * vocabulary-scale path (dictionary bands + shingle sets replicated to
    * every task — zero shuffle on the corpus side beyond the token
    * distinct). `broadcastDict = false` is the BIG-dictionary path (a
    * dictionary of millions of surfaces exceeds any broadcast threshold):
    * both the candidate join and the verify join become shuffled
    * equi-joins — on (band, sig) and (surface, entity) respectively — so
    * the dictionary streams through the exchange like any fact table and
    * never materializes whole on one executor. Join hints pin the shape so
    * AQE cannot silently re-broadcast a "small today" dictionary that
    * grows tomorrow.
    *
    * `bucketCap` is the LSH hygiene bound on the blocked candidate join
    * (see [[fuzzyScoredTiers]]): a (band, sig) bucket larger than the cap
    * on either side is dropped before the join, bounding the per-bucket
    * candidate product at cap². */
  def entityLinkFuzzyDF(docs: DataFrame, dictionary: DataFrame,
                        threshold: Double = 0.5,
                        broadcastDict: Boolean = true,
                        subjectOf: Column => Column =
                          id => concat(lit(docNs), id),
                        bucketCap: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tiers = fuzzyScoredTiers(docs, dictionary, threshold, broadcastDict,
      materialize = true, bucketCap = bucketCap)
    // TIERED resolution: the exact tier leaves fuzzyScoredTiers ALREADY
    // resolved (duplicate surfaces collapsed dictionary-side to min
    // entity — the rank-1-by-(jac=1, entity) rule — so the join emits one
    // row per (doc_id, w) with no corpus-scale aggregation). The residual
    // fuzzy tier resolves at VOCABULARY scale — its candidates are keyed
    // by the token alone (jac is a pure function of (w, surface)), so the
    // rank-1 window runs over distinct residual tokens, never mentions,
    // and the winner joins back to the (doc_id, w) mention relation.
    // Exact and fuzzy tiers are disjoint by construction (the fuzzy tier
    // only sees tokens with NO exact surface match), so the union needs
    // no cross-tier re-ranking.
    val exactResolved = tiers.exact
    val wnd = Window.partitionBy("w").orderBy(col("jac").desc, col("entity"))
    val fuzzyWinners = tiers.fuzzy.withColumn("rn", row_number().over(wnd))
      .filter(col("rn") === 1).select("w", "entity", "jac")
    val fuzzyResolved = tiers.residual.join(fuzzyWinners, Seq("w"))
      .select("doc_id", "w", "entity", "jac")
    val resolved = exactResolved.unionByName(fuzzyResolved)
      .localCheckpoint() // eager, rank-1-scale: releases the caches below
    tiers.release()
    // subjectOf maps the doc key to the emitted subject IRI — the default
    // wraps a numeric doc_id in the doc namespace; the deployment pipeline
    // passes identity because its doc key IS the page url
    // count, NOT countDistinct: resolved is rank-1 per (doc_id, w), so w
    // is unique within every (doc_id, entity) group by construction — the
    // distinct-aggregate expansion would re-derive a fact the resolve
    // step already established
    resolved.groupBy(col("doc_id"), col("entity"))
      .agg(count(col("w")).as("n_mentions"), round(max(col("jac")), 6).as("top_jac"))
      .select(subjectOf(col("doc_id")).as("s"),
        lit(pMentions).as("p"), col("entity").as("o"),
        col("n_mentions"), col("top_jac"))
  }

  /** EXACT-surface-only entity linking — the full-corpus tier of a
    * production linking pipeline, without the fuzzy residual machinery
    * (shingles, minhash bands, Jaccard verify): token string-equals
    * surface, resolved to min(entity) per token (identical to
    * [[entityLinkFuzzyDF]]'s exact tier), aggregated to one mention row
    * per (document, entity). Tokens with no exact surface simply do not
    * link. Same output schema as the fuzzy path (top_jac = 1 by
    * definition), so the two modes are drop-in interchangeable; the
    * deployment entry exposes the choice as `--link-mode`. Plan: one
    * equi-join + two hash aggregations, nothing else — at 100 TB this is
    * the mode that runs over every page, with the fuzzy path reserved for
    * the (bounded) residual vocabulary. */
  def entityLinkExactDF(docs: DataFrame, dictionary: DataFrame,
                        broadcastDict: Boolean = true,
                        subjectOf: Column => Column =
                          id => concat(lit(docNs), id)): DataFrame = {
    // the SAME token/dictionary builders as fuzzyScoredTiers' exact tier
    // (shared helpers, not copies): the two modes must resolve an exact
    // token to the same entity or --link-mode exact and the fuzzy path
    // would silently disagree
    val tok = mentionTokens(docs)
    val side = resolvedDictSide(dictionary, broadcastDict)
    // tok is distinct per (doc_id, w) and the dictionary side is unique
    // per surface, so count(w) counts distinct mention tokens exactly
    tok.join(side, col("w") === col("surface"))
      .groupBy(col("doc_id"), col("entity"))
      .agg(count(col("w")).as("n_mentions"))
      .select(subjectOf(col("doc_id")).as("s"),
        lit(pMentions).as("p"), col("entity").as("o"),
        col("n_mentions"), lit(1.0).as("top_jac"))
  }

  /** Distinct (doc_id, w) mention tokens, >= 3 chars (the shingleable
    * minimum) — the stage-0 relation shared by BOTH link modes. */
  private def mentionTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) >= 3).distinct()

  /** The exact-tier dictionary side shared by BOTH link modes: duplicate
    * surfaces resolve to min(entity) per surface (the rank-1-by-(jac=1,
    * entity) rule) at DICTIONARY scale, BEFORE any corpus join — each
    * token then matches at most one dictionary row, so no post-join
    * (doc_id, w) resolution aggregation exists at all (one mention-scale
    * exchange removed; measured on the 2.56M-page table, BENCH.md).
    * Distribution-hinted: broadcast for vocabulary-scale dictionaries,
    * pinned shuffle_merge for big dictionaries so AQE cannot re-broadcast
    * a growing one. */
  private def resolvedDictSide(dictionary: DataFrame,
                               broadcastDict: Boolean): DataFrame = {
    val dictResolved = dictionary.select(col("surface"), col("entity"))
      .filter(length(col("surface")) >= 3)
      .groupBy("surface").agg(min(col("entity")).as("entity"))
    if (broadcastDict) broadcast(dictResolved)
    else dictResolved.hint("shuffle_merge")
  }

  /** The two scored candidate tiers plus a cache-release hook — see
    * [[entityLinkFuzzyDF]] (tiered resolution) and [[fuzzyScored]] (the
    * flat union, the spec/Explain plan hook). `exact` is mention-scale
    * (doc_id, w, entity, jac=1), already resolved; `fuzzy` is
    * VOCABULARY-scale (w, entity, jac) — one row per candidate (token,
    * surface) pair regardless of how many documents mention the token;
    * `residual` is the (doc_id, w) mention relation of tokens with no
    * exact match, for joining fuzzy winners back to documents. */
  private[graft] final case class ScoredTiers(exact: DataFrame,
                                              fuzzy: DataFrame,
                                              residual: DataFrame,
                                              release: () => Unit)

  /** The scored-candidate stage of [[entityLinkFuzzyDF]] as a flat union
    * of the exact and fuzzy tiers. With `materialize = true` the result is
    * eagerly checkpointed and the internal caches released. With
    * `materialize = false` the full UNcheckpointed plan is returned — the
    * spec hook for asserting the join strategy (broadcast vs shuffled
    * dictionary) on the complete physical plan. */
  private[graft] def fuzzyScored(docs: DataFrame, dictionary: DataFrame,
                                 threshold: Double, broadcastDict: Boolean,
                                 materialize: Boolean,
                                 bucketCap: Int = 64): DataFrame = {
    val tiers = fuzzyScoredTiers(docs, dictionary, threshold, broadcastDict,
      materialize, bucketCap)
    val all0 = tiers.exact.unionByName(
      tiers.residual.join(tiers.fuzzy, Seq("w"))
        .select("doc_id", "w", "entity", "jac"))
    if (!materialize) all0
    else {
      val all = all0.localCheckpoint()
      tiers.release()
      all
    }
  }

  /** The scored-candidate tiers of [[entityLinkFuzzyDF]]: `exact` holds
    * (doc_id, w, entity, jac=1) rows from the exact-surface equi-join —
    * ALREADY RESOLVED, one row per (doc_id, w), because duplicate
    * surfaces collapse dictionary-side to min(entity) before the join;
    * `fuzzy` the blocked+verified residual candidates (unresolved,
    * VOCABULARY-scale — see below); `residual` the (doc_id, w) mentions
    * the fuzzy tier covers. With `materialize = true` (the production
    * path) the token and shingle relations are persisted for their
    * multiple consumers; the caller MUST invoke `release()` after
    * materializing whatever it derives from the tiers.
    *
    * Two scale invariants of the fuzzy tier, both learned from a
    * composed-deployment run that filled 45 GB of shuffle disk in 30
    * minutes (a 2.56M-page synthetic corpus whose token vocabulary was
    * structurally self-similar — `t<cluster>x<j>` — so nearly every
    * residual token hashed into a handful of LSH buckets):
    *
    *  1. VOCABULARY-scale blocking: shingle Jaccard against the
    *     dictionary is a pure function of the TOKEN, so shingling,
    *     minhash, banding, candidate generation, and verify all run over
    *     DISTINCT residual tokens, never (doc, token) mention pairs — at
    *     web scale the vocabulary is orders of magnitude smaller than the
    *     mention relation, and a token shared by a million pages is
    *     scored once.
    *  2. `bucketCap` (same hygiene as [[graft.ops.Dedup.minhashLshPairs]]):
    *     a (band, sig) bucket holding more than `bucketCap` rows on
    *     EITHER side is dropped before the candidate join — the join is
    *     quadratic within a bucket (|vocab bucket| × |dict bucket|), and
    *     a bucket that hot means the shingle space has degenerated and
    *     carries no similarity signal anyway. Bounded: candidates per
    *     bucket ≤ cap². The cap is a deterministic window count, so the
    *     DuckDB oracle reproduces the identical drop set. */
  private[graft] def fuzzyScoredTiers(docs: DataFrame, dictionary: DataFrame,
                                      threshold: Double, broadcastDict: Boolean,
                                      materialize: Boolean,
                                      bucketCap: Int = 64): ScoredTiers = {
    import org.apache.spark.sql.expressions.Window
    // stage 0: distinct mention tokens (mentionTokens, the builder shared
    // with entityLinkExactDF); consumed twice (exact join + residual
    // anti-join) — persisted across the two passes when materializing
    val tok = if (materialize) mentionTokens(docs).persist()
    else mentionTokens(docs)
    val dict = dictionary.select(col("surface"), col("entity"))
      .filter(length(col("surface")) >= 3)
    // EXACT-FIRST short-circuit: a token string-equal to a surface has
    // shingle Jaccard exactly 1 (identical strings => identical shingle
    // sets), so it resolves through a plain equi-join with NO shingling,
    // minhash, or set intersection; only the RESIDUAL tokens (no exact
    // surface match anywhere in the dictionary) enter the blocked fuzzy
    // path. Web-scale mentions are overwhelmingly exact dictionary hits,
    // so the expensive fuzzy machinery becomes a tail-only cost (measured
    // on the 2.56M-page deployment table, 300k-surface shuffled dict:
    // link stage 564s -> see BENCH.md). Documented divergence from the
    // pre-r5 all-fuzzy rank: a token with an exact match no longer sees
    // candidates from OTHER surfaces whose 3-gram SET coincides with its
    // own (a jac=1 tie, e.g. anagram-like forms): the exact surface's
    // entity now wins outright where the old (jac desc, entity) order
    // could prefer the coincidental entity when it sorted lower. Exact
    // string identity beating shingle-set coincidence is the expected
    // linking behavior; the DuckDB oracle mirrors the same rule.
    // duplicate surfaces resolve on the DICTIONARY side (resolvedDictSide,
    // the builder shared with entityLinkExactDF) so the exact tier comes
    // out of the join ALREADY resolved — one row per (doc_id, w), no
    // corpus-scale resolution aggregation downstream
    val dictExact = resolvedDictSide(dictionary, broadcastDict)
    val exact = tok.join(dictExact, col("w") === col("surface"))
      .select(col("doc_id"), col("w"), col("entity"),
        lit(1.0).as("jac"))
    val surfaces = dict.select("surface").distinct()
    val surfSide =
      if (broadcastDict) broadcast(surfaces) else surfaces.hint("shuffle_merge")
    // residual mentions have TWO consumers (the vocabulary distinct below
    // and the caller's fuzzy-winner join-back) — persisted alongside tok
    // when materializing so the anti-join runs once
    val tokR0 = tok.join(surfSide, col("w") === col("surface"), "left_anti")
    val tokR = if (materialize) tokR0.persist() else tokR0
    // the fuzzy machinery runs at VOCABULARY scale: one row per distinct
    // residual token. Shingle sets and minhash bands are both computed
    // ROW-LOCALLY ([[rowShingleBands]]/[[shinglesOf]]): the r2-r5 shape
    // exploded a (key, shingle) relation and aggregated it back twice
    // (4-min minhash groupBy + collect_set verify sets) per side — four
    // shingle-scale exchanges and two persisted relations for values every
    // row can compute in place over its own ≤(len-2)-element shingle set.
    // The only remaining exchanges are the bucket-cap windows, the
    // candidate join, and the verify joins themselves.
    //
    // What IS still persisted: the narrow distinct-token/dedup'd-dict
    // frames the row-local expressions are computed OVER. The vocabulary
    // distinct is a full shuffle of the residual mention relation (~10M
    // distinct tokens on the 2.56M-page deployment table) with two
    // consumers (band rows + verify sets) — without the persist it ran
    // twice, measured as a 68 s -> 146 s link-stage regression on that
    // table before this cache was added. Persisting one string column per
    // vocabulary row is far cheaper than the r5 shape's persisted
    // (key, shingle) explode relation.
    val vocab0 = tokR.select("w").distinct()
    val vocab = if (materialize) vocab0.persist() else vocab0
    def capped(bands: DataFrame): DataFrame = {
      val w = Window.partitionBy("band", "sig")
      bands.withColumn("__bn", count(lit(1)).over(w))
        .filter(col("__bn") <= bucketCap).drop("__bn")
    }
    val mentionBands = capped(vocab
      .select(col("w"), explode(rowShingleBands(col("w"))).as("bs"))
      .select(col("w"), col("bs.band").as("band"), col("bs.sig").as("sig")))
    // duplicate (surface, entity) dictionary rows collapse here — the old
    // minhash groupBy / collect_set aggregations deduped them implicitly,
    // and the bucket-cap counts and verify fan-out must not see them
    // twice; a dictionary-scale narrow dedup is far cheaper than the
    // shingle-relation shuffles it replaces. Persisted for its two
    // consumers (band rows + verify sets) like vocab above.
    val dictU0 = dict.dropDuplicates("surface", "entity")
    val dictU = if (materialize) dictU0.persist() else dictU0
    val dictBands = capped(dictU
      .select(col("surface"), col("entity"),
        explode(rowShingleBands(col("surface"))).as("bs"))
      .select(col("surface"), col("entity"),
        col("bs.band").as("band"), col("bs.sig").as("sig")))
    val dictBandSide =
      if (broadcastDict) broadcast(dictBands) else dictBands.hint("shuffle_merge")
    // stage 1: blocked candidates — equi-join on (band, sig), both sides
    // bucket-capped above
    val cand = mentionBands.join(dictBandSide, Seq("band", "sig"))
      .select("w", "surface", "entity").distinct()
    // stage 2: exact Jaccard verify on shingle sets (vocabulary × matched
    // surfaces, never mentions), sets row-local as above
    val wsets = vocab.select(col("w"), shinglesOf(col("w")).as("wg"))
    val dsets0 = dictU.select(col("surface"), col("entity"),
      shinglesOf(col("surface")).as("sg"))
    val dsetSide =
      if (broadcastDict) broadcast(dsets0) else dsets0.hint("shuffle_merge")
    val scored0 = cand.join(wsets, Seq("w"))
      .join(dsetSide, Seq("surface", "entity"))
      .withColumn("inter", size(array_intersect(col("wg"), col("sg"))))
      .withColumn("jac",
        col("inter") / (size(col("wg")) + size(col("sg")) - col("inter")))
      .filter(col("jac") >= threshold)
      // prune to the resolve-stage columns here: the shingle-set arrays
      // must not ride into any downstream materialization
      .select(col("w"), col("entity"), col("jac"))
    ScoredTiers(exact, scored0, tokR, () => {
      vocab.unpersist(); dictU.unpersist(); tokR.unpersist(); tok.unpersist()
      ()
    })
  }

  /** BFS reachability (graph.ex reachability semantics): iterative frontier
    * join, depth-bounded. Edges (src, dst) as longs; returns (node,
    * depth=min). Each iteration is one shuffled equi-join; lineage is
    * TRUNCATED per iteration via localCheckpoint so iteration d costs one
    * join, not the replay of joins 1..d-1 — per-iteration wall time stays
    * flat at depth 10+. Edges are cached once (they are re-scanned every
    * iteration). Early exit on an empty frontier. */
  def reachable(edges: DataFrame, start: Long, maxDepth: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // hash-partitioned by the per-depth join key so each frontier join
    // moves only the frontier, never the cached edge set (see pageRank's
    // withDeg comment)
    val e = edges.repartition(col("src")).persist()
    var visited = Seq((start, 0)).toDF("node", "depth").localCheckpoint()
    var frontier = visited
    var d = 1
    var done = false
    while (d <= maxDepth && !done) {
      val newNodes = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node"), lit(d).as("depth"))
        .distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint() // truncate lineage: one materialized frontier per depth
      done = newNodes.isEmpty
      if (!done) {
        frontier = newNodes
        visited = visited.unionAll(newNodes).localCheckpoint()
      }
      d += 1
    }
    e.unpersist()
    // depths are unique per node by construction (anti-join against visited)
    visited.groupBy("node").agg(min("depth").as("depth"))
  }

  /** Deterministic link graph over the documents: i -> (2i)%n, (3i+1)%n. */
  def docEdges(docs: DataFrame): DataFrame = {
    val n = docs.count() // small metadata-only action; n is a plan constant
    docs.select(col("doc_id").as("src"), pmod(col("doc_id") * 2, lit(n)).as("dst"))
      .unionAll(docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") * 3 + 1, lit(n)).as("dst")))
  }

  /** PageRank over the document link graph — the crawl-prioritization /
    * page-quality signal of a webtext pipeline. FIXED-POINT integer
    * arithmetic throughout: ranks are scaled by `scale` (default 1e12) and
    * every step is integer division and exact integer sums, so the result
    * is bit-identical regardless of aggregation order — double-valued
    * PageRank cannot be cross-engine oracle-checked because FP addition is
    * order-dependent, while this variant hashes equal against the same
    * chained-CTE computation in any SQL engine.
    *
    * Per iteration: contribution(u->v) = rank(u) div outdeg(u); rank'(v) =
    * (15·scale div (100·N)) + (85·Σ contribs) div 100 — i.e. damping 0.85
    * as exact 85/100 integer ops, mass from dangling-free nodes only (the
    * simplified formulation; nodes without out-links leak mass in both the
    * Spark and oracle computation identically).
    *
    * Scale shape: the edge table is cached once; each of the `iterations`
    * rounds is ONE shuffled equi-join plus ONE hash aggregation on dst.
    * Dangling-IN nodes (no incoming edge) are NOT recovered by a second
    * outer join against the node set — the cached node set is unioned into
    * the aggregation input as zero contributions, so one exchange carries
    * both the transpose and the node-completion (measured: the outer-join
    * round shape cost ~0.43s/round at sf0.1 vs ~0.29s fused; at cluster
    * scale it removes a whole N-row join per round). Round 1 never joins
    * at all: the initial rank is the uniform scale/N constant, so its
    * contribution is `(scale/N) div deg` computed directly on the cached
    * degree-edge frame. `localCheckpoint` truncates lineage every
    * `checkpointInterval` rounds (the `reachable`-proven pattern, so round
    * t never replays rounds 1..t-1). Iteration count is fixed
    * (deterministic), not convergence-tested: the oracle must run the
    * same number of rounds. */
  def pageRank(edges: DataFrame, iterations: Int = 3,
               scale: Long = 1000000000000L,
               checkpointInterval: Int = 4): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.persist()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count() // metadata-scale action; N is a plan constant
    if (n == 0) { // empty graph: empty ranks, not a driver divide-by-zero
      nodes.unpersist(); e.unpersist()
      // keep the REAL schema (node = the src column's own type): a
      // spark.range-derived frame would make both columns bigint and
      // downstream unionByName/joins on the empty-graph path hit type
      // mismatches or silent casts
      return e.select(col("src").as("node"), lit(0L).as("rank_fp")).limit(0)
    }
    // HASH-PARTITION the cached degree-edge frame by src ONCE: every
    // round's contribution join probes it on src, but the frame would
    // otherwise cache with the SCAN's partitioning (AQE broadcasts the
    // tiny degree side, so the join preserves no useful distribution) and
    // each round would re-shuffle the whole edge set — the dominant
    // per-round cost at scale. With the explicit repartition the cached
    // partitioning satisfies the join's requirement and only the
    // node-scale rank side moves per round (guide §2.4: two operations
    // keyed the same way share one exchange).
    val withDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(e, "src").select(col("src"), col("dst"), col("deg"))
      .repartition(col("src")).persist()
    val base = (15L * scale) / (100L * n)
    // zero contribution per node: unioned into every round's aggregation
    // input so nodes with no incoming edge keep a rank row without a
    // second (outer) join — the one exchange per round carries both the
    // edge transpose and the node-completion
    val zeros = nodes.select(col("node").as("dst"), lit(0L).as("c"))
    def step(contribs: DataFrame): DataFrame =
      contribs.unionAll(zeros)
        .groupBy(col("dst").as("node"))
        .agg((lit(base) + expr("(85 * sum(c)) div 100")).as("r"))
    // ranks is referenced ONCE per round (the contribution join), so the
    // unmaterialized plan grows LINEARLY per round — checkpoint every
    // `checkpointInterval` rounds to bound lineage depth and
    // scheduler/codegen cost while skipping the per-round materialization
    // cost between checkpoints. The default (4) deliberately exceeds the
    // default 3 iterations: short runs pay ZERO mid-run checkpoints
    // (linear 3-deep lineage is cheap — a measured mid-run checkpoint cost
    // ~1s at sf0.1) and rely on the FINAL checkpoint below; long runs
    // truncate every 4 rounds.
    // `div` (IntegralDivide), NOT `/`: Column./ on longs is double
    // division, and double floor can disagree with exact integer floor
    // when the fraction 1/deg approaches the double ulp.
    // Round 1's rank is the uniform scale/N for EVERY node, so its
    // contribution join against the init frame collapses to a constant
    // expression over the cached degree-edge frame — no join at all.
    var ranks =
      if (iterations == 0) nodes.withColumn("r", lit(scale / n))
      else step(withDeg.select(col("dst"),
        expr(s"cast(${scale / n} as bigint) div deg").as("c")))
    var sinceCheckpoint = 1
    if (sinceCheckpoint >= checkpointInterval && iterations > 0) {
      ranks = ranks.localCheckpoint(); sinceCheckpoint = 0
    }
    for (_ <- 2 to iterations) {
      val contribs = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), expr("r div deg").as("c"))
      ranks = step(contribs)
      sinceCheckpoint += 1
      if (sinceCheckpoint >= checkpointInterval) {
        ranks = ranks.localCheckpoint()
        sinceCheckpoint = 0
      }
    }
    // materialize the final ranks BEFORE releasing the cached inputs —
    // otherwise the caller's first action replays the whole iterative
    // chain from the (now-uncached) source
    val out = ranks.select(col("node"), col("r").as("rank_fp")).localCheckpoint()
    withDeg.unpersist(); nodes.unpersist(); e.unpersist()
    out
  }
}
