package graft.sources

import java.sql.Connection
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Pool introspection — the reference's `PoolState`
  * (`connection/mod.rs:56-60`): total live physical connections and
  * how many of them are idle in the pool. */
final case class PoolState(connections: Int, idleConnections: Int)

/** Bounded per-JVM JDBC connection pool — the Spark-executor analogue
  * of the reference's bb8 pools (`table.rs:469-493` LazyPool,
  * `connection/postgres.rs:65-95` pool construction with
  * `pool_max_size`/`pool_min_idle`/`pool_idle_timeout`, defaults
  * 10/0/600 s, `connection/options.rs:90-93`).
  *
  * Why this matters at cluster scale: executors are long-lived JVMs
  * running many short scan/write tasks. Without a pool, a 1,000-task
  * stage against one remote database is a connection storm the remote
  * will refuse; with an executor-scoped bounded pool, each executor
  * holds at most `poolmaxsize` physical connections regardless of how
  * many tasks it schedules, and sequential tasks reuse warm
  * connections instead of paying a handshake each.
  *
  * Pools are keyed by connection identity (url + credentials + driver)
  * and created lazily on first borrow, like the reference's
  * `LazyPool.get_or_init_pool`. A JVM-wide daemon reaper closes idle
  * connections older than the idle timeout, keeping `poolminidle`
  * spares (the bb8 idle-reaper semantics).
  */
object GraftConnectionPool {

  final case class PoolKey(
      url: String,
      user: Option[String],
      password: Option[String],
      driver: Option[String])

  def keyOf(opts: RemoteOptions): PoolKey =
    PoolKey(opts.url, opts.user, opts.password, opts.driverClass)

  /** One bounded pool for one remote identity. Borrowed connections
    * are exclusively owned until released; idle ones are validated on
    * checkout so a remote-side kill never surfaces as a dead handle. */
  final class Pool(
      val key: PoolKey,
      val maxSize: Int,
      val minIdle: Int,
      val idleTimeoutMs: Long) {

    private final case class Idle(conn: Connection, since: Long)

    private val lock = new Object
    private var idle = List.empty[Idle] // most recently released first
    private var live = 0                // physical: idle + borrowed
    private var closedFlag = false      // drained pools stop caching
    val physicalOpens = new AtomicLong(0)
    val physicalCloses = new AtomicLong(0)

    def state: PoolState = lock.synchronized(PoolState(live, idle.size))

    private def quietClose(c: Connection): Unit = {
      try c.close() catch { case scala.util.control.NonFatal(_) => () }
      physicalCloses.incrementAndGet()
    }

    private def isUsable(c: Connection): Boolean =
      try !c.isClosed && c.isValid(2) catch {
        case scala.util.control.NonFatal(_) => false
      }

    def borrow(physicalOpen: () => Connection, checkoutTimeoutMs: Long): Connection = {
      val deadline = System.nanoTime() + checkoutTimeoutMs * 1000000L
      while (true) {
        var mustOpen = false
        var candidate: Connection = null
        lock.synchronized {
          if (idle.nonEmpty) { candidate = idle.head.conn; idle = idle.tail }
          else if (live < maxSize) { live += 1; mustOpen = true }
          else {
            val waitMs = (deadline - System.nanoTime()) / 1000000L
            if (waitMs <= 0) throw new java.sql.SQLTransientConnectionException(
              s"connection pool for ${key.url} exhausted: " +
                s"$maxSize connections all in use after ${checkoutTimeoutMs}ms")
            lock.wait(waitMs)
          }
        }
        if (candidate != null) {
          // validate OUTSIDE the monitor: a dead connection's network
          // timeout (isValid up to 2 s + TCP teardown) must not stall
          // every other task's borrow/release on this executor
          if (isUsable(candidate)) return candidate
          quietClose(candidate)
          lock.synchronized { live -= 1; lock.notifyAll() } // retry loop
        } else if (mustOpen) {
          // open OUTSIDE the lock: a slow remote handshake must not
          // serialize every other task on this executor
          try return physicalOpen()
          catch {
            case e: Throwable =>
              lock.synchronized { live -= 1; lock.notifyAll() }
              throw e
          }
        }
      }
      throw new IllegalStateException("unreachable")
    }

    /** Return a connection to the pool. Transactional state is wiped
      * (rollback + autoCommit restore) so the next borrower always
      * sees a clean session; unusable handles are discarded. */
    def release(c: Connection): Unit = {
      val clean =
        try {
          if (c.isClosed) false
          else {
            if (!c.getAutoCommit) { c.rollback(); c.setAutoCommit(true) }
            c.clearWarnings()
            true
          }
        } catch { case scala.util.control.NonFatal(_) => false }
      lock.synchronized {
        if (clean && !closedFlag) idle ::= Idle(c, System.currentTimeMillis())
        else { live -= 1; quietClose(c) }
        lock.notifyAll()
      }
    }

    /** Close idle connections older than the idle timeout, keeping
      * `minIdle` spares (newest kept). Called by the reaper daemon and
      * directly by specs for deterministic tests. */
    def reap(nowMs: Long = System.currentTimeMillis()): Int = {
      val toClose = lock.synchronized {
        val (fresh, stale) = idle.partition(nowMs - _.since < idleTimeoutMs)
        val spares = math.max(0, minIdle - fresh.size)
        val (kept, close) = stale.splitAt(spares) // stale is newest-first
        idle = fresh ++ kept
        live -= close.size
        lock.notifyAll()
        close
      }
      // physical closes outside the monitor (can block on TCP teardown)
      toClose.foreach(i => quietClose(i.conn))
      toClose.size
    }

    private[sources] def isClosed: Boolean = lock.synchronized(closedFlag)

    /** A borrowed connection was closed behind the pool's back (caller
      * bypassed `GraftConnections.close`): the slot it held must be
      * returned or the pool's live count stays elevated forever and
      * eventually manufactures spurious checkout-timeout exhaustion. */
    private[sources] def evictLeaked(): Unit = lock.synchronized {
      live -= 1
      lock.notifyAll()
    }

    /** Close every idle connection (spec teardown). Borrowed ones are
      * untouched — they close on release via the emptied pool check. */
    def drain(): Unit = {
      val toClose = lock.synchronized {
        closedFlag = true
        val c = idle
        live -= c.size
        idle = Nil
        lock.notifyAll()
        c
      }
      toClose.foreach(i => quietClose(i.conn))
    }
  }

  private val pools = new ConcurrentHashMap[PoolKey, Pool]()
  private val warnedMismatch =
    ConcurrentHashMap.newKeySet[PoolKey]()

  /** Reference `pool_ttl_check_interval` default (`options.rs:93`). */
  private val reapPeriodMs = 30000L
  private lazy val reaper: Thread = {
    val t = new Thread(() => {
      while (true) {
        Thread.sleep(reapPeriodMs)
        pools.values().forEach(p =>
          try p.reap() catch { case scala.util.control.NonFatal(_) => () })
        try GraftConnections.sweepLeaked()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }, "graft-connection-pool-reaper")
    t.setDaemon(true)
    t.start()
    t
  }

  def poolFor(opts: RemoteOptions): Pool = {
    // a drained pool must not linger in the map: it stops caching
    // (open/close per checkout, no pooling, no warning) — replace it
    // with a fresh pool instead
    var p = pools.computeIfAbsent(keyOf(opts), _ =>
      new Pool(keyOf(opts), opts.poolMaxSize, opts.poolMinIdle,
        opts.poolIdleTimeoutMs))
    while (p.isClosed) {
      pools.remove(keyOf(opts), p)
      p = pools.computeIfAbsent(keyOf(opts), _ =>
        new Pool(keyOf(opts), opts.poolMaxSize, opts.poolMinIdle,
          opts.poolIdleTimeoutMs))
    }
    // pool config is fixed at first creation per identity; silently
    // ignoring a later differing request hides "why didn't my
    // poolmaxsize change anything" — say so once per pool
    if ((p.maxSize != opts.poolMaxSize || p.minIdle != opts.poolMinIdle ||
        p.idleTimeoutMs != opts.poolIdleTimeoutMs) &&
        warnedMismatch.add(p.key))
      System.err.println(
        s"[graft] connection pool for ${opts.url} already exists with " +
          s"maxSize=${p.maxSize}/minIdle=${p.minIdle}/idleTimeoutMs=" +
          s"${p.idleTimeoutMs}; requested " +
          s"${opts.poolMaxSize}/${opts.poolMinIdle}/${opts.poolIdleTimeoutMs} " +
          "ignored (pool settings bind at first use per JVM)")
    reaper // start the daemon on first pool creation
    p
  }

  def state(opts: RemoteOptions): PoolState =
    Option(pools.get(keyOf(opts))).map(_.state).getOrElse(PoolState(0, 0))

  /** Drop every pool and close all idle connections (spec isolation). */
  def drainAll(): Unit = {
    val it = pools.values().iterator()
    while (it.hasNext) { it.next().drain(); it.remove() }
  }
}
