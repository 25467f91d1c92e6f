package graft.tools

/** Regenerate README.md's Measured section from an existing merged bench
  * artifact (default `target/bench.json`) without re-running the bench —
  * the same renderer [[graft.Bench]] invokes at the end of every run. */
object ReadmeSync {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "target/bench.json"
    val merged = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    graft.Bench.renderReadme(merged)
    println(s"README regenerated from $path")
  }
}
