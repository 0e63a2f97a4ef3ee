package graft

import graft.operators.HeavyHitters

/** Count-Min heavy hitters: never-underestimate + bound semantics. */
class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("estimates are exact with a wide grid and flagged ok") {
    val docs = Seq(
      "a a a a a b b b c c",
      "a a b c d e f g h i"
    ).toDF("text")
    val out = HeavyHitters.heavyHittersVerified(docs, "text", k = 3, depth = 4, width = 4096, marginTokens = 0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // top-3 by (count desc, token): a=7, b=4, c=3
    assert(out.keySet == Set("a", "b", "c"))
    assert(out("a") == (7L, 1L) && out("b") == (4L, 1L) && out("c") == (3L, 1L))
  }

  test("a colliding grid never underestimates") {
    // width 1: every token lands in the same cell -> estimate = total
    // token count for every hitter; still >= exact (CMS invariant)
    val docs = Seq("x x x y z").toDF("text")
    val out = HeavyHitters.heavyHittersVerified(docs, "text", k = 2, depth = 2, width = 1, marginTokens = 100)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.values.forall(_ == 1L), s"collision pushed estimate below exact or past margin: $out")
  }
}
