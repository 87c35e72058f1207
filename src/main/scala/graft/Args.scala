package graft

/** Shared STRICT CLI parse for the spark-submit deployment mains
  * ([[PipelineMain]], [[QueryMain]]): an unknown flag, a typo, a
  * duplicated flag, a dangling flag, or a flag-like token in value
  * position must abort the job, never silently run with defaults — a
  * cluster submission that drops a stage because of a typo'd flag wastes
  * the whole allocation before anyone notices. */
object Args {
  def strictParse(args: Array[String], valueFlags: Set[String],
                  boolFlags: Set[String]): Map[String, String] = {
    val opts = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < args.length) {
      val k = args(i)
      if (!valueFlags.contains(k) && !boolFlags.contains(k))
        sys.error(s"unknown flag: '$k' " +
          s"(known: ${(valueFlags ++ boolFlags).toSeq.sorted.mkString(", ")})")
      if (opts.contains(k)) sys.error(s"duplicate flag: '$k'")
      if (boolFlags.contains(k)) { opts(k) = "true"; i += 1 }
      else {
        if (i + 1 >= args.length)
          sys.error(s"dangling flag: '$k' (takes one value)")
        val v = args(i + 1)
        if (v.startsWith("--"))
          sys.error(s"flag '$k' expects a value, got flag-like token '$v'")
        opts(k) = v; i += 2
      }
    }
    opts.toMap
  }
}
