package graft.bench

/** Parse-proof probe for the driver's bench channel: prints one JSON line
  * to stdout. `sbt -batch "runMain graft.bench.StdoutProbe"` must emit the
  * line UNPREFIXED (no sbt "[info] " wrapper) — that is what
  * `run / outputStrategy := StdoutOutput` in build.sbt guarantees, and what
  * the round driver's BENCH_r{N}.json parse requires of graft.Bench.
  */
object StdoutProbe {
  def main(args: Array[String]): Unit =
    println("""{"metric":"stdout_probe","value":1,"unit":"ok"}""")
}
