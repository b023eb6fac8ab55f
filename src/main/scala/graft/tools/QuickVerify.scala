package graft.tools

import graft.{SparkEntry, Verify}

/** Dev tool: Verify for a SUBSET of queries — iterate on one operator
  * without replaying the whole multi-minute dump. Same session, dump
  * loop, and oracle-JSON escaping as the full `graft.Verify` (shared
  * core), so the subset run cannot silently diverge from the gate.
  *
  * Usage: runMain graft.tools.QuickVerify <sfDir> <outDir> <query...>
  * Then:  python3 tools/oracle_check.py <outDir> <sfDir>
  */
object QuickVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2).toSet
    // a typo'd name must fail loudly — silently matching nothing would
    // dump an empty oracle set that oracle_check reports as a green
    // "0/0 queries match"
    val unknown = names.diff(SparkEntry.queries.keySet)
    require(names.nonEmpty,
      "QuickVerify: no query names given — usage: <sfDir> <outDir> <query...> " +
        s"(valid: ${SparkEntry.queries.keySet.toSeq.sorted.take(8).mkString(", ")}, ...)")
    require(unknown.isEmpty,
      s"QuickVerify: unknown query names: ${unknown.mkString(", ")} " +
        s"(valid: ${SparkEntry.queries.keySet.toSeq.sorted.take(8).mkString(", ")}, ...)")
    Verify.run(sfDir, outDir, names, verbose = true)
  }
}
