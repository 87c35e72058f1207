package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{Materialize, WebKg}

/** Cluster entry point for the full KG construction job — the
  * spark-submit deployment shape of the north rule (run it at N and at 4N
  * executors for the scaling criterion; `tools/submit.sh` wraps the
  * invocation, and `graft.Bench`'s interleaved local[N]/local[4N] pairs
  * are the sandbox proxy for the same comparison).
  *
  * Stages: read the Common-Crawl-style page table (url, warc_ts, html,
  * text, lang) -> keep the newest crawl per url -> extract triples (one
  * codegen pass over the html) -> set-semantic dedup -> materialize the
  * bucketed store with per-bucket lineage. RESUMABLE: a re-run with the
  * same --out after a mid-write failure skips buckets the lineage table
  * already records (Materialize.materialize's anti-join), so the job
  * continues instead of restarting.
  *
  * No `.master(...)` here: spark-submit supplies the cluster manager,
  * executor count, and memory — the session only carries job-level conf.
  * Prints ONE JSON metrics line on success.
  */
object PipelineMain {
  private val knownFlags =
    Set("--pages", "--out", "--buckets", "--batch-id")

  /** STRICT parse: an unknown flag, a typo, or a dangling flag must abort
    * the job, never silently run with defaults. */
  private[graft] def parseArgs(args: Array[String]): Map[String, String] = {
    if (args.length % 2 != 0)
      sys.error(s"dangling argument: '${args.last}' (flags take one value)")
    val opts = args.grouped(2).map { case Array(k, v) => k -> v }.toMap
    val unknown = opts.keySet -- knownFlags
    if (unknown.nonEmpty)
      sys.error(s"unknown flag(s): ${unknown.mkString(", ")} " +
        s"(known: ${knownFlags.toSeq.sorted.mkString(", ")})")
    opts
  }

  private def jsonStr(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val pages = opts.getOrElse("--pages",
      sys.error("required: --pages <parquet dir of (url, warc_ts, html, text, lang)>"))
    val out = opts.getOrElse("--out", sys.error("required: --out <store root>"))
    val buckets = opts.getOrElse("--buckets", "64").toInt
    // default batch id is unique per invocation: a crashed run resumed
    // with the same command must NOT share the first run's id, or the
    // returned lineage (filtered by batch id) would count the crashed
    // run's buckets as this run's and inflate triples_per_sec
    val batchId = opts.getOrElse("--batch-id",
      f"batch-${System.currentTimeMillis}%013d")
    // stop only a session WE created — getOrCreate may attach to a host
    // process's session (tests, notebooks), which is not ours to kill
    val preExisting =
      SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val builder = SparkSession.builder()
      .appName("graft-kg-construct")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit owns the master in deployment; SPARK_MASTER is the
    // documented fallback for master-less local runs (sandbox, dev box)
    val spark = sys.env.get("SPARK_MASTER")
      .fold(builder)(builder.master).getOrCreate()
    val t0 = System.nanoTime()
    // prune BEFORE the snapshot: extraction derives everything from the
    // html, so the redundant pre-extracted text column must not ride
    // through the snapshot aggregation's buffers (nested-field pruning
    // does not reach into the max_by struct; measured 2.6x on the
    // snapshot+extract stage — PipeProbe)
    val snap = WebKg.latestSnapshot(
      spark.read.parquet(pages).select("url", "warc_ts", "html", "lang"))
    val triples = WebKg.dedupTriples(WebKg.extractFlat(snap))
    val stats = Materialize.materialize(triples, out, buckets, batchId)
    val agg = stats.agg(
      coalesce(sum("n_triples"), lit(0L)).as("t"),
      count(lit(1)).as("b")).head()
    val (total, written) = (agg.getLong(0), agg.getLong(1))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"pages":"${jsonStr(pages)}%s","out":"${jsonStr(out)}%s","batch_id":"${jsonStr(batchId)}%s","buckets_written":$written%d,"triples":$total%d,"sec":$sec%.3f,"triples_per_sec":${if (sec > 0) (total / sec).toLong else 0L}%d}""")
    if (preExisting.isEmpty) spark.stop()
  }
}
