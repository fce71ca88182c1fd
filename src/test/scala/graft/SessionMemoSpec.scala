package graft

import graft.core.SessionMemo

class SessionMemoSpec extends SparkSpec {

  test("memoizes per (session, key); newSession() gets its own entry") {
    val memo = new SessionMemo[String, Int]
    var builds = 0
    def build(): Int = { builds += 1; builds }

    assert(memo.getOrElseUpdate(spark, "k")(build()) == 1)
    assert(memo.getOrElseUpdate(spark, "k")(build()) == 1, "second call is a hit")
    assert(builds == 1)

    val sibling = spark.newSession()
    assert(memo.getOrElseUpdate(sibling, "k")(build()) == 2,
      "a sibling session over the same context is a distinct cache scope")
    assert(builds == 2)
  }

  test("evict releases a retired session without touching its siblings") {
    val memo = new SessionMemo[String, Int]
    val retired = spark.newSession()
    memo.getOrElseUpdate(spark, "a")(1)
    memo.getOrElseUpdate(retired, "a")(2)
    memo.getOrElseUpdate(retired, "b")(3)

    assert(memo.evict(retired) == 2)
    assert(memo.evict(retired) == 0, "idempotent")
    // the surviving session's entry is still a hit
    assert(memo.getOrElseUpdate(spark, "a")(sys.error("must not rebuild")) == 1)
    // the retired session rebuilds on next use
    assert(memo.getOrElseUpdate(retired, "a")(42) == 42)
  }
}
