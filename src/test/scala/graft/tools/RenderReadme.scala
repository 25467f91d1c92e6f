package graft.tools

/** Re-render README.md's generated bench section from the EXISTING
 * target/bench.json — template wording changes should not require a
 * full bench re-run (the artifact stays the single source; only the
 * prose around its keys moves). */
object RenderReadme {
  def main(args: Array[String]): Unit = {
    val merged = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("target/bench.json")), "UTF-8")
    graft.Bench.renderReadme(merged)
    println("README rendered from target/bench.json")
  }
}
