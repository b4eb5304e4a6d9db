package graft

import graft.operators.SessionMemo

class SessionMemoSpec extends SparkSpecBase {

  test("getOrElseUpdate builds once per (session, dir, key) and memoizes") {
    val memo = new SessionMemo[Int, String]
    var builds = 0
    def get(dir: String, k: Int): String =
      memo.getOrElseUpdate(spark, dir, k) { builds += 1; s"$dir/$k" }
    assert(get("a", 1) === "a/1")
    assert(get("a", 1) === "a/1")
    assert(builds === 1)
    assert(get("a", 2) === "a/2")
    assert(get("b", 1) === "b/1")
    assert(builds === 3)
    assert(memo.size === 3)
  }

  test("invalidatePath drops only that dir's entries and fires onEvict") {
    val evicted = scala.collection.mutable.ListBuffer.empty[String]
    val memo = new SessionMemo[Int, String](evicted += _)
    memo.getOrElseUpdate(spark, "a", 1)("a1")
    memo.getOrElseUpdate(spark, "a", 2)("a2")
    memo.getOrElseUpdate(spark, "b", 1)("b1")
    memo.invalidatePath("a")
    assert(evicted.sorted === Seq("a1", "a2"))
    assert(memo.size === 1)
    var rebuilt = false
    memo.getOrElseUpdate(spark, "a", 1) { rebuilt = true; "a1'" }
    assert(rebuilt) // the dropped entry is gone, not resurrected
    memo.getOrElseUpdate(spark, "b", 1)(fail("b must still be memoized"))
  }

  test("invalidate(session) drops that session's entries; other sessions keep theirs") {
    val memo = new SessionMemo[Int, String]
    val other = spark.newSession()
    memo.getOrElseUpdate(spark, "d", 1)("mine")
    memo.getOrElseUpdate(other, "d", 1)("theirs")
    assert(memo.size === 2) // distinct sessions → distinct entries
    SessionMemo.invalidate(spark)
    assert(memo.size === 1)
    memo.getOrElseUpdate(other, "d", 1)(fail("other session's entry must survive"))
  }

  test("session keys are stable per session object and distinct across sessions") {
    val a = SessionMemo.sessionKey(spark)
    assert(SessionMemo.sessionKey(spark) === a)
    assert(SessionMemo.sessionKey(spark.newSession()) !== a)
  }

  test("a drop racing an in-flight build still releases the built value") {
    // the leak class the memo exists to prevent: invalidate fires while
    // the builder thread is inside the lazy val — the drop must either
    // wait the build out (holder monitor) or mark the holder so the
    // build side self-evicts; a value whose entry is gone may never
    // keep its cached blocks pinned
    val evicted = new java.util.concurrent.atomic.AtomicInteger(0)
    val memo = new SessionMemo[Int, String](_ => evicted.incrementAndGet())
    val buildStarted = new java.util.concurrent.CountDownLatch(1)
    val builder = new Thread(() =>
      memo.getOrElseUpdate(spark, "race", 1) {
        buildStarted.countDown()
        Thread.sleep(300) // a slow build (e.g. caching a signature table)
        "built"
      })
    builder.start()
    buildStarted.await()
    memo.invalidatePath("race") // fires mid-build
    builder.join()
    assert(memo.size === 0)
    // EXACTLY once: the drop side consumes the eviction under the
    // holder lock, so the build side's dropped-check is a no-op — a
    // double onEvict would break the first non-idempotent callback
    // anyone registers
    assert(evicted.get() === 1,
      "the in-flight build's value must be evicted exactly once " +
        s"(got ${evicted.get()})")
    // and the entry is genuinely gone: the next get rebuilds
    var rebuilt = false
    memo.getOrElseUpdate(spark, "race", 1) { rebuilt = true; "fresh" }
    assert(rebuilt)
  }

  test("onEvict failures don't abort invalidation") {
    val memo = new SessionMemo[Int, String](_ => sys.error("unpersist on a stopped session"))
    memo.getOrElseUpdate(spark, "x", 1)("v1")
    memo.getOrElseUpdate(spark, "x", 2)("v2")
    memo.invalidatePath("x") // must not throw
    assert(memo.size === 0)
  }
}
