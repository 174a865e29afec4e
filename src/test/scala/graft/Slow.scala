package graft

import org.scalatest.Tag

/** Marks tests that sweep the full query registry or run sf0.01 data gates —
  * minutes, not seconds. Plain `sbt test` excludes them by default (see
  * build.sbt) so the fast gate finishes inside the CI budget; the full gate
  * is `GRAFT_SLOW_TESTS=1 sbt test`, and the Slow suites alone run with
  * `sbt "testOnly * -- -n graft.Slow"`.
  */
object Slow extends Tag("graft.Slow")
