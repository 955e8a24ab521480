package graft.probes

/** Render the probe-embedded shipped-artifact fixtures to `artifacts/`
  * — run after changing a generator so the committed file and the
  * in-code fixture stay equal (LangIdModelSpec pins them).
  */
object DumpArtifacts {
  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(
      if (args.nonEmpty) args(0) else "artifacts/langid_real.profile")
    java.nio.file.Files.write(out,
      TextProbes.q175Artifact.getBytes("UTF-8"))
    println(s"wrote $out (${TextProbes.q175Artifact.length} chars)")
  }
}
