package graft.sources

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The executor-side session lifecycle (reference
 * CassandraClient.java:14-68 double-checked singleton,
 * MvSync.java:296-302 executor re-init, DBOperations retry-then-err),
 * driven by fake flaky sessions — the semantics are provable offline
 * even though the real CqlSession needs a cluster. */
class ExecutorSessionSpec extends AnyFunSuite {

  private final class FakeSession extends AutoCloseable {
    var closed = false
    override def close(): Unit = closed = true
  }

  private def freshKey(): String =
    s"spec-${java.lang.Long.toHexString(System.nanoTime())}"

  test("one factory call per key no matter how many threads race") {
    val key = freshKey()
    val calls = new AtomicInteger
    val factory = () => {
      // widen the race window so a broken implementation actually fails
      Thread.sleep(5)
      calls.incrementAndGet()
      new FakeSession
    }
    val results = new java.util.concurrent.ConcurrentLinkedQueue[FakeSession]()
    val threads = (1 to 16).map(_ => new Thread(() =>
      results.add(ExecutorSession.get(key, factory)): Unit))
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(calls.get() == 1)
    val distinct = new java.util.HashSet[FakeSession]()
    results.forEach(s => distinct.add(s): Unit)
    assert(distinct.size == 1)
    ExecutorSession.closeAll()
  }

  test("invalidate closes and the next get re-creates (executor re-init)") {
    val key = freshKey()
    val calls = new AtomicInteger
    val factory = () => { calls.incrementAndGet(); new FakeSession }
    val s1 = ExecutorSession.get(key, factory)
    assert(ExecutorSession.get(key, factory) eq s1)
    ExecutorSession.invalidate(key)
    assert(s1.closed)
    val s2 = ExecutorSession.get(key, factory)
    assert(!(s2 eq s1))
    assert(calls.get() == 2)
    ExecutorSession.closeAll()
  }

  test("withRetry survives transient failures on fresh sessions") {
    val key = freshKey()
    val made = new AtomicInteger
    val factory = () => { made.incrementAndGet(); new FakeSession }
    class Timeout extends RuntimeException("timeout")
    var fails = 2
    val out = ExecutorSession.withRetry(key, factory,
      ExecutorSession.RetryPolicy(maxAttempts = 3, initialBackoffMs = 1,
        transient = _.isInstanceOf[Timeout])) { s =>
      assert(!s.closed, "retry must run on a fresh, open session")
      if (fails > 0) { fails -= 1; throw new Timeout }
      "ok"
    }
    assert(out == "ok")
    // two failed attempts each invalidated (closed) their session and
    // the third opened a fresh one
    assert(made.get() == 3)
    ExecutorSession.closeAll()
  }

  test("non-transient failures fail fast; attempts are bounded") {
    val key = freshKey()
    val made = new AtomicInteger
    val factory = () => { made.incrementAndGet(); new FakeSession }
    class Timeout extends RuntimeException("timeout")
    class Invalid extends RuntimeException("invalid query")
    // non-transient: a single attempt, no session churn
    intercept[Invalid] {
      ExecutorSession.withRetry(key, factory,
        ExecutorSession.RetryPolicy(maxAttempts = 5, initialBackoffMs = 1,
          transient = _.isInstanceOf[Timeout])) { _ => throw new Invalid }
    }
    assert(made.get() == 1)
    // transient but never succeeding: exactly maxAttempts, then the
    // last failure propagates (the caller's err-counter path)
    intercept[Timeout] {
      ExecutorSession.withRetry(key, factory,
        ExecutorSession.RetryPolicy(maxAttempts = 3, initialBackoffMs = 1,
          transient = _.isInstanceOf[Timeout])) { _ => throw new Timeout }
    }
    // attempt 1 reused the live session; attempts 2-3 re-created after
    // invalidation => 2 more factory calls
    assert(made.get() == 3)
    ExecutorSession.closeAll()
  }

  test("closeAll closes every live session") {
    val k1 = freshKey(); val k2 = freshKey()
    val s1 = ExecutorSession.get(k1, () => new FakeSession)
    val s2 = ExecutorSession.get(k2, () => new FakeSession)
    ExecutorSession.closeAll()
    assert(s1.closed && s2.closed)
  }
}
