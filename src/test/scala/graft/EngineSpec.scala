package graft

import org.scalatest.funsuite.AnyFunSuite

/** Engine.session applies the full configuration contract in one
  * call — the invariants every other suite assumes individually.
  */
class EngineSpec extends AnyFunSuite {

  test("session carries the engine's configuration contract") {
    // getOrCreate reuses the shared test session's context but must
    // still apply session-level confs and installations
    val s = Engine.session(parallelism = 4)
    assert(s.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(s.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(s.conf.get("spark.sql.sources.v2.bucketing.enabled") === "true")
    // native functions resolvable from SQL
    assert(s.sql("SELECT portable_hash60('x') AS h").head().getLong(0)
      === graft.expressions.Kernels.portableHash60(
        org.apache.spark.unsafe.types.UTF8String.fromString("x")))
    // TopK machinery installed
    assert(s.experimental.extraOptimizations
      .contains(graft.plans.TopKRewriteRule))
    // idempotent: calling again must not double-install
    Engine.session(parallelism = 4)
    assert(s.experimental.extraOptimizations
      .count(_ == graft.plans.TopKRewriteRule) === 1)
  }
}
