package graft

import org.scalatest.Tag

/** Marks tests that sweep the full query registry or run sf0.01 data gates —
  * minutes, not seconds. The fast PR loop excludes them:
  *   sbt "testOnly * -- -l graft.Slow"     (< 2 min)
  * The full gate (CI / pre-commit for engine changes) stays plain `sbt test`.
  */
object Slow extends Tag("graft.Slow")
