package graft.sources

/**
 * Executor-side SESSION LIFECYCLE — the offline restatement of the one
 * §2-T surface the connector seam still left implicit: the reference
 * holds a single `CqlSession` per executor JVM behind double-checked
 * locking (CassandraClient.java:14-68), re-initializes it lazily when
 * an executor (re)starts a task (MvSync.java:296-302), and retries
 * transient mutation failures against it before counting an error
 * (DBOperations.java error paths feeding delErr/upsertErr counters).
 *
 * This utility is that lifecycle with the driver-specific type held
 * abstract: a live connector's ScanBuilder/DataWriter implementations
 * call `ExecutorSession.get("cluster", factory)` where this engine's
 * parquet data plane opens files — one shared, lazily-created,
 * concurrently-safe session per (JVM, key), plus the bounded-backoff
 * retry wrapper a remote data plane needs and a local one doesn't.
 * Nothing here is parquet-specific by design: the spec drives it with
 * fake flaky sessions, which is exactly the point — the lifecycle and
 * retry semantics are provable offline even though the real
 * `CqlSession` needs a cluster.
 *
 * Semantics (each spec-pinned):
 *  - one factory call per (JVM, key) no matter how many tasks race
 *    first use (double-checked locking on a per-key holder);
 *  - `invalidate` closes and forgets, so the next `get` re-creates —
 *    the executor-restart / broken-connection path;
 *  - `withRetry` retries TRANSIENT failures (caller-classified, the
 *    way drivers distinguish timeouts from invalid queries) with
 *    bounded exponential backoff, invalidating the session between
 *    attempts so a wedged connection cannot poison every retry; the
 *    final failure propagates — the caller's error-file/err-counter
 *    path (operator O's ERR files) takes over from there.
 */
object ExecutorSession {

  /** Retry discipline for a remote data plane. `transient` classifies
   * which failures are worth a fresh session and another attempt —
   * everything else (the reference's invalid-query case) fails fast. */
  final case class RetryPolicy(
      maxAttempts: Int = 3,
      initialBackoffMs: Long = 10L,
      transient: Throwable => Boolean = _ => true) {
    require(maxAttempts >= 1, "maxAttempts must be >= 1")
  }

  private final class Holder {
    @volatile var session: AnyRef = _
  }

  private val holders =
    new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  /** The shared session for `key`, created on first use — exactly one
   * factory call survives any number of concurrent first users. */
  def get[S <: AutoCloseable](key: String, factory: () => S): S = {
    val h = holders.computeIfAbsent(key, _ => new Holder)
    val s = h.session
    if (s != null) s.asInstanceOf[S]
    else h.synchronized {
      // double-checked: a racer may have created it while we waited
      if (h.session == null) h.session = factory()
      h.session.asInstanceOf[S]
    }
  }

  /** Close and forget `key`'s session; the next `get` re-creates. The
   * close error is swallowed — a broken session is being discarded
   * precisely because it can no longer be talked to. */
  def invalidate(key: String): Unit = {
    val h = holders.get(key)
    if (h != null) h.synchronized {
      val s = h.session
      h.session = null
      if (s != null) {
        try s.asInstanceOf[AutoCloseable].close()
        catch { case _: Exception => () }
      }
    }
  }

  /** Run `op` against the shared session, retrying transient failures
   * on a FRESH session with exponential backoff. */
  def withRetry[S <: AutoCloseable, A](key: String, factory: () => S,
      policy: RetryPolicy = RetryPolicy())(op: S => A): A = {
    var attempt = 1
    var backoff = policy.initialBackoffMs
    while (true) {
      try return op(get(key, factory))
      catch {
        case e: Throwable if attempt < policy.maxAttempts &&
            policy.transient(e) =>
          invalidate(key)
          Thread.sleep(backoff)
          backoff *= 2
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Test/shutdown hook: close everything (executors do this via JVM
   * shutdown in the reference; specs need it for isolation). */
  def closeAll(): Unit = {
    val keys = java.util.Collections.list(holders.keys())
    keys.forEach(k => invalidate(k))
    keys.forEach(k => holders.remove(k): Unit)
  }
}
