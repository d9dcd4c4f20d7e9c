package graft

/** Resolves the dev tools' durable output files (`tools/bench_last.json`,
  * `tools/scalecheck.json`, `tools/streamcheck.json`, the bench reference)
  * against the REPO ROOT rather than the process CWD: sbt may be launched
  * from anywhere, and a CWD-relative write would silently land the durable
  * record elsewhere — defeating the "stdout tail truncates, the file is
  * the durable copy" rationale. Override with SPARK_GRAFT_REPO; otherwise
  * the CWD is used only when it actually contains the tools/ directory.
  */
object ToolPaths {
  def repoRoot: String = sys.env.getOrElse("SPARK_GRAFT_REPO",
    if (new java.io.File("tools").isDirectory) "." else "/root/repo")
  def resolve(rel: String): String =
    if (new java.io.File(rel).isAbsolute) rel
    else new java.io.File(repoRoot, rel).getPath
}
