package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.pipeline.Materialize

class GraphsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false").getOrCreate()

  private val ex = "http://ex.org/"
  private def tri(s: String, p: String, o: Term) =
    Triple(Term.iri(ex + s), Term.iri(ex + p), o)

  private def g1 = {
    import spark.implicits._
    Seq(
      tri("a", "p", Term.str("1")), tri("a", "q", Term.str("2")),
      tri("b", "p", Term.str("3")), tri("b", "p", Term.iri(ex + "a"))).toDF()
  }

  test("add is set-semantic union") {
    import spark.implicits._
    val other = Seq(tri("a", "p", Term.str("1")), tri("c", "p", Term.str("9"))).toDF()
    assert(Graphs.add(g1, other).count() == 5)
  }

  test("delete removes exactly the given statements") {
    import spark.implicits._
    val del = Seq(tri("a", "p", Term.str("1"))).toDF()
    val out = Graphs.delete(g1, del)
    assert(out.count() == 3)
    assert(!Graphs.includesAll(out, del))
  }

  test("put replaces whole subjects") {
    import spark.implicits._
    val repl = Seq(tri("a", "r", Term.str("new"))).toDF()
    val out = Graphs.put(g1, repl)
    assert(out.count() == 3) // a's two old triples gone, one new, b's two stay
    assert(Graphs.includesAll(out, repl))
  }

  test("putProperties replaces only (s,p) pairs") {
    import spark.implicits._
    val repl = Seq(tri("a", "p", Term.str("new"))).toDF()
    val out = Graphs.putProperties(g1, repl)
    assert(out.count() == 4) // a/p replaced, a/q kept
    assert(Graphs.includesAll(out, repl))
  }

  test("projections and counts") {
    assert(Graphs.subjectCount(g1) == 2)
    assert(Graphs.predicateCount(g1) == 2)
    assert(Graphs.statementCount(g1) == 4)
    assert(Graphs.resources(g1).count() == 2) // {a, b}; a is subject AND object
    assert(Graphs.describes(g1, Term.iri(ex + "a")))
    assert(!Graphs.describes(g1, Term.iri(ex + "zzz")))
    assert(Graphs.description(g1, Term.iri(ex + "a")).count() == 2)
  }

  test("renameResource substitutes across all positions") {
    val out = Graphs.renameResource(g1, Term.iri(ex + "a"), Term.iri(ex + "A2"))
    assert(Graphs.description(out, Term.iri(ex + "A2")).count() == 2)
    assert(!Graphs.describes(out, Term.iri(ex + "a")))
    // object position too
    import spark.implicits._
    assert(Graphs.includesAll(out, Seq(tri("b", "p", Term.iri(ex + "A2"))).toDF()))
  }

  test("values produces per-subject predication maps") {
    val v = Graphs.values(g1).collect()
    assert(v.length == 2)
  }

  test("equalGraphs and intersection") {
    assert(Graphs.equalGraphs(g1, g1.orderBy(rand(7))))
    assert(Graphs.intersection(g1, g1.limit(2)).count() == 2)
  }

  test("distributed Turtle decode per document") {
    import spark.implicits._
    val docs = Seq(
      ("http://d/1", "@prefix e: <http://ex.org/> . e:a e:p \"x\", \"y\" ."),
      ("http://d/2", "<s> <p> [ <q> 42 ] ."))
    val out = Graphs.parseTurtleDocs(spark.createDataset(docs))
    assert(out.count() == 4)
    // relative IRIs resolved against the document id as base
    assert(out.filter(col("doc") === "http://d/2" &&
      col("s")("value") === "http://d/s").count() == 1)
  }

  test("canonicalizePerGroup gives deterministic, group-unique bnode labels") {
    import spark.implicits._
    def doc(id: String) = Seq(
      (id, Term.bnode("x"), Term.iri(ex + "p"), Term.str("v")),
      (id, Term.bnode("x"), Term.iri(ex + "q"), Term.bnode("y")))
    val quads = (doc("d1") ++ doc("d2")).toDF("doc", "s", "p", "o")
    val out1 = Graphs.canonicalizePerGroup(quads, "doc").collect()
      .map(r => (r.getString(0), r.getStruct(1).getString(1))).sorted.toSeq
    val out2 = Graphs.canonicalizePerGroup(quads, "doc").collect()
      .map(r => (r.getString(0), r.getStruct(1).getString(1))).sorted.toSeq
    assert(out1 == out2) // deterministic
    val labels = out1.map(_._2).distinct
    assert(labels.size == 2) // one canonical subject label per doc, prefixed uniquely
  }

  test("bnodeComponents groups co-occurring bnodes") {
    import spark.implicits._
    val g = Seq(
      Triple(Term.bnode("a"), Term.iri(ex + "p"), Term.bnode("b")),
      Triple(Term.bnode("b"), Term.iri(ex + "p"), Term.bnode("c")),
      Triple(Term.bnode("z"), Term.iri(ex + "p"), Term.str("v"))).toDF()
    val comp = Graphs.bnodeComponents(g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(comp("a") == comp("b") && comp("b") == comp("c"))
    assert(comp("z") != comp("a"))
  }

  test("bnodeComponents converges on a deep chain and 3 components") {
    import spark.implicits._
    // component 1: a 15-bnode chain (diameter > the old default of 10
    // rounds; min-label still converges because labels propagate from the
    // minimum, but assert correctness rather than silent splitting)
    val chain = (0 until 14).map(i =>
      Triple(Term.bnode(f"c$i%02d"), Term.iri(ex + "p"), Term.bnode(f"c${i + 1}%02d")))
    val comp2 = Seq(Triple(Term.bnode("m"), Term.iri(ex + "p"), Term.bnode("n")))
    val comp3 = Seq(Triple(Term.bnode("z"), Term.iri(ex + "p"), Term.str("v")))
    val g = (chain ++ comp2 ++ comp3).toDF()
    val comp = Graphs.bnodeComponents(g, maxIter = 20).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert((0 to 14).map(i => comp(f"c$i%02d")).distinct.size == 1)
    assert(comp("m") == comp("n"))
    assert(Set(comp("c00"), comp("m"), comp("z")).size == 3)
  }

  test("canonicalizeDataset: cross-document shared bnodes canonicalize as one component") {
    import spark.implicits._
    // two "documents" whose bnodes share a hub bnode — the case
    // canonicalizePerGroup (pre-partitioned by doc) cannot handle — plus a
    // ground triple that must bypass canonicalization untouched
    def dataset(a1: String, a2: String, hub: String) = Seq(
      Triple(Term.bnode(a1), Term.iri(ex + "id"), Term.str("1")),
      Triple(Term.bnode(a1), Term.iri(ex + "memberOf"), Term.bnode(hub)),
      Triple(Term.bnode(a2), Term.iri(ex + "id"), Term.str("2")),
      Triple(Term.bnode(a2), Term.iri(ex + "memberOf"), Term.bnode(hub)),
      Triple(Term.iri(ex + "g"), Term.iri(ex + "p"), Term.str("ground"))).toDF()
    def term(row: org.apache.spark.sql.Row): Term =
      Term(row.getByte(0), row.getString(1), row.getString(2), row.getString(3))
    val out = Graphs.canonicalizeDataset(dataset("a1", "a2", "h")).collect()
    assert(out.length == 5)
    val rows = out.map(r => (term(r.getStruct(0)),
      term(r.getStruct(1)), term(r.getStruct(2))))
    // ground triple untouched
    assert(rows.exists { case (s, _, o) =>
      s.value == ex + "g" && o.value == "ground" })
    // ONE component: every bnode label shares one md5-derived prefix and
    // the three labels are exactly prefix-c14n{0,1,2}
    val labels = rows.flatMap { case (s, _, o) =>
      Seq(s, o).filter(t => t != null && t.isBnode).map(_.value) }.distinct
    val prefixes = labels.map(_.split("-")(0)).distinct
    assert(prefixes.length == 1)
    assert(labels.map(_.split("-")(1)).sorted.toSeq == Seq("c14n0", "c14n1", "c14n2"))
    // the hub stays the shared object of both memberOf triples
    val hubLabels = rows.collect {
      case (_, p, o) if p.value == ex + "memberOf" => o.value }
    assert(hubLabels.length == 2 && hubLabels.distinct.length == 1)
    // deterministic + isomorphism-invariant SHAPE: renaming input bnodes
    // changes only the component prefix, never the structure or the
    // component-local labels
    def shape(df: org.apache.spark.sql.DataFrame) =
      Graphs.canonicalizeDataset(df).collect().map { r =>
        def strip(t: org.apache.spark.sql.Row) = {
          val tt = term(t)
          if (tt.isBnode) tt.value.split("-")(1) else tt.value
        }
        (strip(r.getStruct(0)), strip(r.getStruct(1)), strip(r.getStruct(2)))
      }.sorted.toSeq
    assert(shape(dataset("a1", "a2", "h")) == shape(dataset("x9", "q7", "w")))
  }

  test("bnodeComponents: pointer doubling converges a 60-chain in <=20 rounds") {
    import spark.implicits._
    // diameter 59 >> maxIter 20: plain min-label propagation needs ~59
    // rounds and would hit the non-convergence throw; pointer doubling
    // converges in O(log 60) ~ 6-8 rounds
    val chain = (0 until 59).map(i =>
      Triple(Term.bnode(f"d$i%03d"), Term.iri(ex + "p"), Term.bnode(f"d${i + 1}%03d")))
    val comp = Graphs.bnodeComponents(chain.toDF(), maxIter = 20).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert((0 to 59).map(i => comp(f"d$i%03d")).distinct.size == 1)
  }

  test("materialize with lineage supports checkpoint resume") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val triples = (0 until 100)
      .map(i => (s"http://ex.org/s$i", ex + "p", s"o$i")).toDF("s", "p", "o")
    val first = Materialize.materialize(triples, root, numBuckets = 8, batchId = "b1")
    assert(first.count() == 8)
    assert(Materialize.readGraph(spark, root).count() == 100)
    // resume: everything already materialized -> zero new lineage rows
    val second = Materialize.materialize(triples, root, numBuckets = 8, batchId = "b2")
    assert(second.count() == 0)
    // partial resume: wipe lineage rows for two buckets, re-run
    val lineage = Materialize.readLineage(spark, root).get
    val keep = lineage.filter(col("bucket") >= 2)
    keep.write.mode("overwrite").parquet(s"$root/lineage2")
    spark.read.parquet(s"$root/lineage2").write.mode("overwrite").parquet(s"$root/lineage")
    val third = Materialize.materialize(triples, root, numBuckets = 8, batchId = "b3")
    assert(third.count() == 2)
    assert(Materialize.readGraph(spark, root).count() == 100) // idempotent overwrite
    // a resume with a DIFFERENT bucket count would silently drop data
    // (bucket ids only mean the same thing under the same count) — the
    // recorded num_buckets makes it fail fast instead
    val e = intercept[IllegalArgumentException] {
      Materialize.materialize(triples, root, numBuckets = 16, batchId = "b4")
    }
    assert(e.getMessage.contains("8 buckets"))
    // the dynamic-overwrite conf is scoped to the write, not the session
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode",
      "static") != "dynamic")
  }

  test("materialize splits a hot bucket into multiple sorted files") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_skew").toString
    // one hub subject carries ~94% of all triples — the only way a hot
    // bucket can arise under subject-hash bucketing. Objects are hash
    // strings so the hot partition's COMPRESSED shuffle size (what the
    // advisory threshold compares against) stays well above the lowered
    // advisory.
    def h(i: Int) = java.lang.Long.toHexString(i * 0x9e3779b97f4a7c15L)
    val hot = (0 until 60000).map(i => ("http://hub.ex.org/page", ex + "p", s"${h(i)}${h(i + 1)}"))
    val cold = (0 until 4000).map(i => (s"http://cold.ex.org/s$i", ex + "p", s"o$i"))
    val prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try {
      val triples = (hot ++ cold).toDF("s", "p", "o").repartition(4)
      Materialize.materialize(triples, root, numBuckets = 4, batchId = "b1")
      val filesPerBucket = new java.io.File(s"$root/data").listFiles()
        .filter(_.isDirectory)
        .map(d => d.listFiles().count(_.getName.endsWith(".parquet")))
      assert(filesPerBucket.max > 1, s"hot bucket did not split: ${filesPerBucket.toSeq}")
      // layout change is invisible to readers: full count, per-subject
      // lookup, and lineage stats all match
      assert(Materialize.readGraph(spark, root).count() == 64000)
      assert(Materialize.lookupSubject(spark, root, "http://hub.ex.org/page", 4)
        .count() == 60000)
      val lin = Materialize.readLineage(spark, root).get
      assert(lin.agg(sum("n_triples")).head().getLong(0) == 64000)
      assert(lin.agg(sum("n_subjects")).head().getLong(0) == 4001)
    } finally spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
  }

  test("quad-level dataset API: graphCount, whoDescribes, graph") {
    import spark.implicits._
    val quads = Seq(
      Quad(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.str("1"), null),
      Quad(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.str("2"), Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "b"), Term.iri(ex + "p"), Term.str("3"), Term.iri(ex + "g2"))).toDF()
    assert(Graphs.graphCount(quads) == 3) // default + g1 + g2
    val who = Graphs.whoDescribes(quads, Term.iri(ex + "a")).collect()
    assert(who.length == 2)
    assert(Graphs.graph(quads, Term.iri(ex + "g2")).count() == 1)
    assert(Graphs.graph(quads, null).count() == 1)
  }

  test("descriptionClosure follows resources; :bnodes mode is the CBD") {
    import spark.implicits._
    val g = Seq(
      tri("a", "p", Term.bnode("b1")),
      Triple(Term.bnode("b1"), Term.iri(ex + "q"), Term.str("v")),
      Triple(Term.bnode("b1"), Term.iri(ex + "r"), Term.iri(ex + "c")),
      tri("c", "p", Term.str("past-iri")), // reachable via IRI only
      tri("z", "p", Term.str("unrelated"))).toDF()
    // :bnodes (CBD): stop at IRI objects
    val cbd = Graphs.descriptionClosure(g, Term.iri(ex + "a"), followBnodesOnly = true)
    assert(cbd.count() == 3) // a's triple + b1's two
    assert(cbd.filter(col("s")("value") === ex + "c").isEmpty)
    // :all — IRIs followed too
    val all = Graphs.descriptionClosure(g, Term.iri(ex + "a"))
    assert(all.count() == 4)
    // predicate whitelist prunes EDGES only — descriptions of visited nodes
    // come back whole (reachability.ex adds Graph.description untrimmed):
    // a's triple is followed via p to b1, whose 2 triples are all included,
    // but q/r edges are not traversed so c is never visited
    val onlyP = Graphs.descriptionClosure(g, Term.iri(ex + "a"),
      predicates = Seq(ex + "p"))
    assert(onlyP.count() == 3)
    assert(onlyP.filter(col("s")("value") === ex + "c").isEmpty)
  }

  test("reachable: custom follow fn, mixed max/bnode depth, and :into") {
    import spark.implicits._
    // reachability.ex doc example: max_depth 1, bnode_depth unlimited
    val b1 = Term.bnode("b1"); val b2 = Term.bnode("b2")
    val g = Seq(
      tri("A", "p", Term.iri(ex + "B")),
      Triple(Term.iri(ex + "B"), Term.iri(ex + "p"), Term.iri(ex + "C")),
      Triple(Term.iri(ex + "B"), Term.iri(ex + "p"), b1),
      Triple(b1, Term.iri(ex + "p"), b2),
      Triple(b2, Term.iri(ex + "p"), Term.iri(ex + "C")),
      Triple(Term.iri(ex + "C"), Term.iri(ex + "p"), Term.iri(ex + "D"))).toDF()
    val mixed = Graphs.reachable(g, Term.iri(ex + "A"),
      maxDepth = 1, bnodeDepth = Int.MaxValue)
    // A + B + b1 + b2 descriptions = 5 triples; C never expanded
    assert(mixed.count() == 5)
    assert(mixed.filter(col("s")("value") === ex + "C").isEmpty)

    // custom follow fn: only subClassOf-like edges, depth <= 2.
    // (local copy: a lambda referencing the spec's `ex` field would capture
    // the spec instance — and its SparkSession — into the task closure)
    val subP = ex + "sub"
    val follow = Graphs.Follow.Custom((_, p, depth) =>
      p.value == subP && depth <= 2)
    val g2 = Seq(
      tri("A", "sub", Term.iri(ex + "B")),
      tri("A", "other", Term.iri(ex + "C")),
      Triple(Term.iri(ex + "B"), Term.iri(ex + "sub"), Term.iri(ex + "D")),
      Triple(Term.iri(ex + "C"), Term.iri(ex + "x"), Term.str("no"))).toDF()
    val custom = Graphs.reachable(g2, Term.iri(ex + "A"), follow = follow)
    // A's full description (incl. the other-edge) + B's + D's (empty) —
    // C followed? other != sub -> no, so C's description is excluded
    assert(custom.count() == 3)
    assert(custom.filter(col("s")("value") === ex + "C").isEmpty)

    // :into merges into an existing target graph
    val target = Seq(tri("Existing", "p", Term.str("O"))).toDF()
    val merged = Graphs.reachable(g2, Term.iri(ex + "A"), follow = follow,
      into = Some(target))
    assert(merged.count() == 4)
    assert(!merged.filter(col("s")("value") === ex + "Existing").isEmpty)
  }

  test("updateAllDescriptions applies per-subject; empty result deletes") {
    val (bS, fooP) = (ex + "b", ex + "foo") // locals: keep the spec out of the closure
    val out = Graphs.updateAllDescriptions(g1, (subj, desc) =>
      if (subj.value == bS) Nil // drop b entirely
      else desc :+ Triple(subj, Term.iri(fooP), Term.int(42)))
    assert(out.count() == 3) // a's 2 + the new foo triple
    assert(out.filter(col("s")("value") === ex + "b").isEmpty)
    assert(out.filter(col("p")("value") === ex + "foo").count() == 1)
    // returned triples are re-subjected to the group subject (graph.ex:
    // "added using the old subject")
    val elsewhere = ex + "elsewhere"
    val hijack = Graphs.updateAllDescriptions(g1, (_, desc) =>
      desc.map(t => Triple(Term.iri(elsewhere), t.p, t.o)))
    assert(hijack.filter(col("s")("value") === ex + "elsewhere").isEmpty)
    assert(hijack.count() == g1.count())
  }

  test("pop and getAndUpdate follow the Access contract") {
    import spark.implicits._
    val (desc, rest) = Graphs.pop(g1, Term.iri(ex + "a"))
    assert(desc.count() == 2 && rest.count() == 2)
    assert(rest.filter(col("s")("value") === ex + "a").isEmpty)
    val extra = Seq(tri("b", "new", Term.str("x"))).toDF()
    val (cur, updated) = Graphs.getAndUpdate(g1, Term.iri(ex + "b"),
      d => d.unionByName(extra))
    assert(cur.count() == 2)
    assert(updated.count() == 5) // b gains one statement
  }

  test("updateAllObjects maps each object; empty result deletes the statement") {
    val qP = ex + "q"
    val out = Graphs.updateAllObjects(g1, (p, o) =>
      if (p.value == qP) Nil
      else if (o.isLiteral) Seq(Term.str(o.value + "!"))
      else Seq(o))
    assert(out.count() == 3) // a.q dropped; others kept
    assert(out.filter(col("o")("value") === "1!").count() == 1)
    assert(out.filter(col("p")("value") === ex + "q").isEmpty)
  }

  test("valueEqual: canonical-value equality, nil for incomparable") {
    import graft.core.XsdOps
    assert(XsdOps.valueEqual(Term.int(1), Term.typedLit("01", Vocab.xsdInteger)).contains(true))
    assert(XsdOps.valueEqual(Term.int(1), Term.typedLit("1.0", Vocab.xsdDecimal)).contains(true))
    assert(XsdOps.valueEqual(Term.int(1), Term.int(2)).contains(false))
    assert(XsdOps.valueEqual(Term.iri(ex + "a"), Term.iri(ex + "a")).contains(true))
    assert(XsdOps.valueEqual(Term.iri(ex + "a"), Term.iri(ex + "b")).contains(false))
    // unrelated datatypes -> nil (reference returns nil)
    assert(XsdOps.valueEqual(Term.str("1"), Term.int(1)).isEmpty)
    // same unknown datatype, different lexicals -> false
    assert(XsdOps.valueEqual(
      Term.typedLit("a", "http://e/custom"), Term.typedLit("b", "http://e/custom")).contains(false))
  }

  test("lookupSubject prunes to one bucket partition") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_lookup").toString
    val triples = (0 until 200)
      .map(i => (s"http://ex.org/s$i", ex + "p", s"o$i")).toDF("s", "p", "o")
    Materialize.materialize(triples, root, numBuckets = 8, batchId = "b1")
    val df = Materialize.lookupSubject(spark, root, "http://ex.org/s42", 8)
    assert(df.collect().map(_.getString(2)).toSeq == Seq("o42"))
    // the bucket predicate must be a PARTITION filter (directory pruning)
    val scans = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.exists(_.partitionFilters.exists(
      _.references.exists(_.name == "bucket"))), scans.map(_.partitionFilters))
    // layout: ONE parquet file per bucket directory, subjects sorted
    // within it (tight row-group s-stats for intra-bucket pruning)
    val bucketDirs = new java.io.File(s"$root/data").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    for (dir <- bucketDirs) {
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${dir.getName}: ${files.length} files")
      val subjects = spark.read.parquet(files.head.getPath)
        .select("s").collect().map(_.getString(0)).toSeq
      assert(subjects == subjects.sorted, dir.getName)
    }
  }

  test("compact merges incremental batches with global dedup") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_incr").toString
    val dest = java.nio.file.Files.createTempDirectory("graft_snap").toString
    val a = Seq(("http://e/s1", ex + "p", "x"), ("http://e/s2", ex + "p", "y"))
      .toDF("s", "p", "o")
    val b = Seq(("http://e/s2", ex + "p", "y"), ("http://e/s3", ex + "p", "z"))
      .toDF("s", "p", "o") // overlaps with a on s2
    Materialize.materializeIncrement(a, src, 4, "b1")
    Materialize.materializeIncrement(b, src, 4, "b2")
    assert(Materialize.readGraph(spark, src).count() == 4) // dup retained per batch
    Materialize.compact(spark, src, dest, 4, "snap1")
    assert(Materialize.readGraph(spark, dest).count() == 3) // global set semantics
  }

  test("diff yields additions and deletions") {
    import spark.implicits._
    val before = Seq(("s1", "p", "a"), ("s2", "p", "b")).toDF("s", "p", "o")
    val after = Seq(("s1", "p", "a"), ("s3", "p", "c")).toDF("s", "p", "o")
    val (adds, dels) = Materialize.diff(before, after)
    assert(adds.collect().map(_.getString(0)).toSeq == Seq("s3"))
    assert(dels.collect().map(_.getString(0)).toSeq == Seq("s2"))
  }

  test("diff and delete are null-safe: default-graph quads (g = null) diff correctly") {
    import spark.implicits._
    val v1 = Seq(("s1", "p", "a", null: String), ("s2", "p", "b", "g1"))
      .toDF("s", "p", "o", "g")
    val v2 = Seq(("s1", "p", "a", null: String), ("s3", "p", "c", "g1"))
      .toDF("s", "p", "o", "g")
    val d = Diff.compute(v1, v2)
    // the unchanged default-graph quad must NOT appear on either side
    assert(d.additions.collect().map(_.getString(0)).toSeq == Seq("s3"))
    assert(d.deletions.collect().map(_.getString(0)).toSeq == Seq("s2"))
    // delete can remove a default-graph quad
    val afterDelete = Graphs.delete(v1,
      Seq(("s1", "p", "a", null: String)).toDF("s", "p", "o", "g"))
    assert(afterDelete.collect().map(_.getString(0)).toSeq == Seq("s2"))
    // applying a diff of identical quad frames is a no-op
    assert(Diff.compute(v1, v1).applyTo(v1).count() == 2)
  }

  test("reachable with a custom follow fn still honors the predicate whitelist") {
    import spark.implicits._
    import graft.core.Term
    val ex = "http://e/"
    def t(s: String, p: String, o: String) =
      (Term.iri(ex + s), Term.iri(ex + p), Term.iri(ex + o))
    val g = Seq(t("a", "follow", "b"), t("a", "skip", "c"), t("b", "follow", "d"))
      .toDF("s", "p", "o")
    val r = Graphs.reachable(g, Term.iri(ex + "a"),
      Graphs.Follow.Custom((_, _, _) => true),
      predicates = Seq(ex + "follow"))
    val subjects = r.select(col("s")("value")).as[String].collect().toSet
    // c is reached only through :skip, which the whitelist must gate even
    // when the custom function says yes — so c's description is absent
    assert(subjects == Set(ex + "a", ex + "b"))
  }

  test("Diff algebra: union, invert, apply, empty (diff.ex semantics)") {
    import spark.implicits._
    def df(rows: (String, String, String)*) = rows.toDF("s", "p", "o")
    // union/2 (diff_test.exs "union/2"): additions+additions, dels+dels
    val d1 = Diff(additions = df(("S", "p", "O1")), deletions = df(("S1", "p", "O")))
    val d2 = Diff(additions = df(("S", "p", "O2")), deletions = df(("S2", "p", "O")))
    val u = d1.union(d2)
    assert(u.additions.count() == 2 && u.deletions.count() == 2)
    // invert/1 swaps the sides
    val inv = d1.invert
    assert(inv.additions.collect().map(_.getString(0)).toSeq == Seq("S1"))
    assert(inv.deletions.collect().map(_.getString(0)).toSeq == Seq("S"))
    // apply/2: delete deletions then add additions; absent deletions ignored
    val g = df(("S1", "p", "O"), ("KEEP", "p", "X"))
    val applied = d1.applyTo(g)
    assert(applied.count() == 2) // S1 deleted, KEEP kept, S/p/O1 added
    assert(applied.filter(col("s") === "S1").isEmpty)
    assert(!applied.filter(col("s") === "S").isEmpty)
    // deletions not present: no-op (diff_test "when the statements to be
    // deleted are not present")
    val applied2 = d1.applyTo(df(("OTHER", "p", "Y")))
    assert(applied2.count() == 2)
    // compute inverse law: applying diff(a, b) to a yields b
    val a = df(("s1", "p", "a"), ("s2", "p", "b"))
    val b = df(("s1", "p", "a"), ("s3", "p", "c"))
    val d = Diff.compute(a, b)
    assert(Graphs.equalGraphs(d.applyTo(a), b))
    assert(Graphs.equalGraphs(d.invert.applyTo(b), a))
    // empty
    assert(Diff.compute(a, a).isEmpty)
    assert(!d.isEmpty)
  }

  test("compactWithDiff rolls batches plus a correction diff into a snapshot") {
    import spark.implicits._
    val root = "/tmp/graft_compact_diff_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val src = s"$root/inc"; val dest = s"$root/snap"
    val batch = Seq(("http://e/s1", ex + "p", "x"), ("http://e/s2", ex + "p", "y"))
      .toDF("s", "p", "o")
    Materialize.materializeIncrement(batch, src, 4, "b1")
    val corr = Diff(
      additions = Seq(("http://e/s3", ex + "p", "z")).toDF("s", "p", "o"),
      deletions = Seq(("http://e/s2", ex + "p", "y")).toDF("s", "p", "o"))
    Materialize.compactWithDiff(spark, src, dest, 4, "snap1", corr)
    val out = Materialize.readGraph(spark, dest)
    assert(out.count() == 2)
    assert(out.filter(col("s") === "http://e/s2").isEmpty)
    assert(!out.filter(col("s") === "http://e/s3").isEmpty)
  }

  test("readLineage: None only for a missing path; corruption rethrows") {
    val root = "/tmp/graft_lineage_spec"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // missing path -> None (first run)
    assert(Materialize.readLineage(spark, root).isEmpty)
    // a lineage DIRECTORY with a corrupt file must RAISE, not silently
    // trigger a full rebuild
    val lin = new java.io.File(s"$root/lineage")
    lin.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/lineage/part-00000.parquet"), "not parquet")
    assertThrows[Exception] {
      Materialize.readLineage(spark, root).foreach(_.collect())
    }
  }
  // ---- quad-level graph-keyed mutations (dataset.ex:304-340,412,478-486)

  private def quadStore = {
    import spark.implicits._
    Seq(
      Quad(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.str("1"), Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "a"), Term.iri(ex + "q"), Term.str("2"), Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "b"), Term.iri(ex + "p"), Term.str("3"), Term.iri(ex + "g2")),
      Quad(Term.iri(ex + "c"), Term.iri(ex + "p"), Term.str("4"), null)).toDF()
  }

  test("putGraph replaces whole named graphs; other graphs untouched") {
    import spark.implicits._
    val input = Seq(
      Quad(Term.iri(ex + "x"), Term.iri(ex + "p"), Term.str("9"), Term.iri(ex + "g1"))).toDF()
    val out = Graphs.putGraph(quadStore, input)
    assert(out.count() == 3) // g1 collapsed to 1 row; g2 + default intact
    val g1rows = Graphs.graph(out, Term.iri(ex + "g1")).collect()
    assert(g1rows.length == 1 && g1rows(0).getStruct(0).getString(1) == ex + "x")
    assert(Graphs.graph(out, Term.iri(ex + "g2")).count() == 1)
    assert(Graphs.graph(out, null).count() == 1)
    // input with g = null replaces the DEFAULT graph
    val inputDefault = Seq(
      Quad(Term.iri(ex + "y"), Term.iri(ex + "p"), Term.str("8"), null)).toDF()
    val out2 = Graphs.putGraph(quadStore, inputDefault)
    assert(Graphs.graph(out2, null).collect().map(_.getStruct(0).getString(1)).toSeq
      == Seq(ex + "y"))
    assert(out2.count() == 4)
    // the :graph destination option re-graphs ALL input statements
    val out3 = Graphs.putGraph(quadStore, input, destination = Some(Term.iri(ex + "g2")))
    assert(Graphs.graph(out3, Term.iri(ex + "g2")).collect()
      .map(_.getStruct(0).getString(1)).toSeq == Seq(ex + "x"))
    assert(Graphs.graph(out3, Term.iri(ex + "g1")).count() == 2) // untouched
    // destination + EMPTY input still replaces (= deletes) that graph:
    // put_graph with :graph puts a possibly-empty graph under the name
    val out4 = Graphs.putGraph(quadStore, input.limit(0),
      destination = Some(Term.iri(ex + "g1")))
    assert(Graphs.graph(out4, Term.iri(ex + "g1")).isEmpty && out4.count() == 2)
  }

  test("deleteGraph drops graphs by name; null names the default graph") {
    val out = Graphs.deleteGraph(quadStore,
      Seq(Term.iri(ex + "g1"), null.asInstanceOf[Term]))
    assert(out.count() == 1)
    assert(Graphs.graph(out, Term.iri(ex + "g2")).count() == 1)
    assert(Graphs.deleteDefaultGraph(quadStore).count() == 3)
    assert(Graphs.deleteGraph(quadStore, Nil).count() == 4)
  }

  test("updateGraph transforms one named graph; absent inserts initial; empty removes") {
    import spark.implicits._
    val extra = Seq(Triple(Term.iri(ex + "n"), Term.iri(ex + "p"), Term.str("new"))).toDF()
    // present: f applied, result re-graphed under the name
    val out = Graphs.updateGraph(quadStore, Term.iri(ex + "g1"),
      g => g.unionByName(extra))
    assert(Graphs.graph(out, Term.iri(ex + "g1")).count() == 3)
    assert(out.count() == 5)
    // empty result removes the graph
    val gone = Graphs.updateGraph(quadStore, Term.iri(ex + "g2"), g => g.limit(0))
    assert(Graphs.graph(gone, Term.iri(ex + "g2")).isEmpty && gone.count() == 3)
    // absent + initial: inserted under the given name
    val ins = Graphs.updateGraph(quadStore, Term.iri(ex + "g9"),
      identity, initial = Some(extra))
    assert(Graphs.graph(ins, Term.iri(ex + "g9")).count() == 1)
    // absent + no initial: unchanged
    assert(Graphs.updateGraph(quadStore, Term.iri(ex + "g9"), identity).count() == 4)
    // default graph addressed by null name
    val def2 = Graphs.updateGraph(quadStore, null, g => g.unionByName(extra))
    assert(Graphs.graph(def2, null).count() == 2)
  }

  test("updateAllGraphs re-graphs f's output under the old name; empty removes") {
    val exg2 = ex + "g2"
    val defaultSubj = ex + "default"
    val out = Graphs.updateAllGraphs(quadStore, (name, triples) =>
      if (name != null && name.value == exg2) Nil // remove g2 wholesale
      else {
        val subj = if (name == null) Term.iri(defaultSubj) else name
        triples :+ Triple(subj, Term.iri(defaultSubj + "#n"), Term.int(triples.size.toLong))
      })
    assert(Graphs.graph(out, Term.iri(ex + "g2")).isEmpty)
    assert(Graphs.graph(out, Term.iri(ex + "g1")).count() == 3) // 2 + count triple
    assert(Graphs.graph(out, null).count() == 2) // 1 + count triple
    // output triples carry the OLD graph name, even if f re-graphs: quads
    // in out never reference a graph not in the input name set
    val names = out.select(col("g")("value")).distinct().collect()
      .map(r => Option(r.getString(0)).getOrElse("null")).toSet
    assert(names == Set(ex + "g1", "null"))
  }

  test("updateAllGraphs fails fast when a graph exceeds maxGraphRows") {
    // g1 holds 2 quads: a bound of 1 must trip the whole-graph-per-task
    // guard with a message routing the caller to updateGraph
    val err = intercept[org.apache.spark.SparkException] {
      Graphs.updateAllGraphs(quadStore, (_, ts) => ts, maxGraphRows = 1L).count()
    }
    val msg = Option(err.getCause).map(_.getMessage).getOrElse(err.getMessage)
    assert(msg.contains("exceeds maxGraphRows") && msg.contains("updateGraph"))
    // at the default bound the same store passes untouched
    assert(Graphs.updateAllGraphs(quadStore, (_, ts) => ts).count() == 4)
    // a cap at/above Int.MaxValue is unreachable (the graph buffers in one
    // Int-indexed task buffer) — rejected up front, never a silent no-op
    val bad = intercept[IllegalArgumentException] {
      Graphs.updateAllGraphs(quadStore, (_, ts) => ts,
        maxGraphRows = Int.MaxValue.toLong + 1)
    }
    assert(bad.getMessage.contains("Int.MaxValue"))
  }

  test("valuesWithContext renders mapped predicates as PropertyMap terms") {
    val out = Graphs.valuesWithContext(g1, Map(ex + "p" -> "p")).collect()
      .map(r => r.getString(0) -> r.getMap[String, Seq[String]](1)).toMap
    // mapped predicate appears under its term key, unmapped under raw IRI
    assert(out(ex + "a").keySet == Set("p", ex + "q"))
    assert(out(ex + "b").keySet == Set("p"))
    assert(out(ex + "b")("p").toSet == Set("3", ex + "a"))
    // empty context degrades to plain values()
    val plain = Graphs.valuesWithContext(g1, Map.empty).collect()
      .map(r => r.getString(0) -> r.getMap[String, Seq[String]](1)).toMap
    assert(plain(ex + "a").keySet == Set(ex + "p", ex + "q"))
  }

  test("datasetValues: per-graph nested projection mirrors dataset_test values/1+2") {
    // dataset_test.exs values/1: one entry per graph name, default graph
    // under nil (null graph_name row here)
    val out = Graphs.datasetValues(quadStore).collect()
      .map(r => (Option(r.getString(0)).getOrElse("null"), r.getString(1),
        r.getMap[String, collection.Seq[String]](2))).toList
    val byKey = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(byKey.keySet == Set((ex + "g1", ex + "a"), (ex + "g2", ex + "b"),
      ("null", ex + "c")))
    assert(byKey((ex + "g1", ex + "a")).keySet == Set(ex + "p", ex + "q"))
    assert(byKey((ex + "g2", ex + "b"))(ex + "p").toSeq == Seq("3"))
    assert(byKey(("null", ex + "c"))(ex + "p").toSeq == Seq("4"))
    // values/2 with PropertyMap context: mapped predicate under term key
    val ctx = Graphs.datasetValues(quadStore, Map(ex + "p" -> "p")).collect()
      .map(r => (Option(r.getString(0)).getOrElse("null"), r.getString(1),
        r.getMap[String, collection.Seq[String]](2)))
    val g1a = ctx.find(t => t._1 == ex + "g1" && t._2 == ex + "a").get._3
    assert(g1a.keySet == Set("p", ex + "q"))
  }

  test("datasetMap: custom per-position fn incl. graph_name, nested shape") {
    // dataset_test.exs map/2: predicate mapped to its local name, graph
    // name passed through, object values verbatim
    val out = Graphs.datasetMap(quadStore, (pos, term) =>
      if (pos == "predicate") term.value.substring(term.value.lastIndexOf('/') + 1)
      else term.value).collect()
      .map(r => (Option(r.getString(0)).getOrElse("null"), r.getString(1),
        r.getMap[String, collection.Seq[String]](2)))
    assert(out.length == 3)
    val g1a = out.find(t => t._1 == ex + "g1" && t._2 == ex + "a").get._3
    assert(g1a.keySet == Set("p", "q") && g1a("q").toSeq == Seq("2"))
    assert(out.find(t => t._1 == "null").get._3("p").toSeq == Seq("4"))
  }

  test("mapStatements applies the custom per-position fn; null result drops the row") {
    val out = Graphs.mapStatements(g1, (pos, term) =>
      if (pos == "predicate") term.value.substring(term.value.lastIndexOf('/') + 1)
      else if (pos == "object" && term.value == "2") null // nil statement
      else term.value)
    val rows = out.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.length == 3) // the o="2" statement dropped
    assert(rows.forall { case (_, p, _) => p == "p" || p == "q" })
    // quad frames also map graph_name, with null g passed through
    import spark.implicits._
    val q = Seq(
      Quad(Term.iri(ex + "a"), Term.iri(ex + "p"), Term.str("1"), Term.iri(ex + "g1")),
      Quad(Term.iri(ex + "b"), Term.iri(ex + "p"), Term.str("2"), null)).toDF()
    val qo = Graphs.mapStatements(q, (_, term) => term.value).collect()
    assert(qo.length == 2)
    assert(qo.map(r => Option(r.getString(3)).getOrElse("null")).toSet
      == Set(ex + "g1", "null"))
  }

}
