package graft.sources

import java.sql.DriverManager
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bounded-pool lifecycle — the Spark-side port of the reference's
  * pool-state integration test (`integration-tests/tests/postgres.rs:403-439`:
  * assert pool connections/idle counts across scans). */
class ConnectionPoolSpec extends AnyFunSuite {

  private def freshDb(tag: String): String = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:/tmp/graft_pool_${tag}_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (K INT)")
    st.executeUpdate("INSERT INTO T VALUES (1), (2), (3)")
    st.close(); c.close()
    url
  }

  private def opts(url: String, extra: (String, String)*): RemoteOptions =
    RemoteOptions(Map("url" -> url, "dbtable" -> "T") ++ extra)

  test("sequential tasks reuse one physical connection") {
    val url = freshDb("reuse")
    val o = opts(url)
    val pool = GraftConnectionPool.poolFor(o)
    val before = pool.physicalOpens.get
    // 5 sequential checkouts: every one after the first must hit the
    // warm idle connection, not a new handshake
    (1 to 5).foreach { _ =>
      GraftConnections.withConnection(o) { c =>
        val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM T")
        rs.next(); assert(rs.getLong(1) == 3)
      }
    }
    assert(pool.physicalOpens.get - before == 1,
      s"expected 1 physical open, got ${pool.physicalOpens.get - before}")
    val st = GraftConnectionPool.state(o)
    assert(st.connections == 1 && st.idleConnections == 1, s"state $st")
  }

  test("scans through the DataFrame API reuse pooled connections") {
    val spark = SparkTestSession.spark
    val url = freshDb("scan")
    val o = opts(url)
    GraftConnectionPool.poolFor(o).drain()
    GraftConnectionPool.drainAll()
    val pool = GraftConnectionPool.poolFor(o)
    val before = pool.physicalOpens.get
    val df = spark.read.format("graft-remote").option("url", url)
      .option("dbtable", "T").load()
    assert(df.count() == 3)
    assert(df.count() == 3)
    val (opened, closed) = GraftConnections.state
    assert(opened == closed, s"borrow/release pairing: $opened != $closed")
    val physical = pool.physicalOpens.get - before
    // schema inference + 2 count jobs = several logical checkouts, but
    // far fewer physical connections (all sequential → exactly 1)
    assert(physical == 1, s"expected 1 physical connection, got $physical")
  }

  test("parallel checkouts never exceed poolmaxsize") {
    val url = freshDb("cap")
    val o = opts(url, "poolmaxsize" -> "2")
    val pool = GraftConnectionPool.poolFor(o)
    assert(pool.maxSize == 2)
    val maxSeen = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val ex = Executors.newFixedThreadPool(8)
    val futures = (1 to 8).map { _ =>
      ex.submit(new Runnable {
        def run(): Unit = {
          start.await()
          GraftConnections.withConnection(o) { c =>
            val s = pool.state
            maxSeen.updateAndGet(m => math.max(m, s.connections))
            val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM T")
            rs.next(); assert(rs.getLong(1) == 3)
            Thread.sleep(20) // force overlap so the cap actually binds
          }
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(30, TimeUnit.SECONDS))
    ex.shutdown()
    assert(maxSeen.get <= 2, s"pool exceeded cap: ${maxSeen.get}")
    assert(pool.state.connections <= 2)
  }

  test("exhausted pool times out loudly instead of hanging") {
    val url = freshDb("exhaust")
    val o = opts(url, "poolmaxsize" -> "1", "poolcheckouttimeout" -> "150")
    val c1 = GraftConnections.open(o)
    try {
      val e = intercept[java.sql.SQLTransientConnectionException] {
        GraftConnections.open(o)
      }
      assert(e.getMessage.contains("exhausted"))
    } finally GraftConnections.close(c1)
    // after release the slot is free again
    GraftConnections.withConnection(o)(c => assert(!c.isClosed))
  }

  test("reaper closes idle connections past the timeout, keeping minIdle spares") {
    val url = freshDb("reap")
    val o = opts(url, "poolidletimeout" -> "0", "poolminidle" -> "1",
      "poolmaxsize" -> "4")
    val pool = GraftConnectionPool.poolFor(o)
    // park 3 idle connections
    val cs = (1 to 3).map(_ => GraftConnections.open(o))
    cs.foreach(GraftConnections.close)
    assert(pool.state.idleConnections == 3)
    val closedNow = pool.reap()
    assert(closedNow == 2, s"reaped $closedNow")
    val st = pool.state
    assert(st.idleConnections == 1 && st.connections == 1, s"state $st")
  }

  test("reference pool-lifecycle parity: 50 concurrent scans, TTL reap drains to (0, 0)") {
    // number-for-number port of the reference's disable_pooled_connections
    // (integration-tests/tests/postgres.rs:402-439): pool_max_size=100,
    // pool_min_idle=0, pool_idle_timeout≈0, 50 concurrent scans of the
    // table, then after the TTL sweep PoolState must read
    // connections=0, idle_connections=0. The reference sleeps 5 s for
    // its 3 s ttl_check_interval; the spec calls reap() directly —
    // deterministic, same observable lifecycle.
    val url = freshDb("parity")
    val o = opts(url, "poolmaxsize" -> "100", "poolminidle" -> "0",
      "poolidletimeout" -> "0")
    GraftConnectionPool.poolFor(o).drain()
    GraftConnectionPool.drainAll()
    val pool = GraftConnectionPool.poolFor(o)
    assert(pool.maxSize == 100 && pool.minIdle == 0)
    val start = new CountDownLatch(1)
    val ex = Executors.newFixedThreadPool(50)
    val futures = (1 to 50).map { _ =>
      ex.submit(new Runnable {
        def run(): Unit = {
          start.await()
          GraftConnections.withConnection(o) { c =>
            val rs = c.createStatement().executeQuery("SELECT * FROM T")
            var n = 0; while (rs.next()) n += 1
            assert(n == 3)
          }
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    ex.shutdown()
    // every borrow released; physical connections all idle in the pool
    val mid = pool.state
    assert(mid.connections > 0 && mid.connections == mid.idleConnections,
      s"unreleased connections: $mid")
    pool.reap()
    val st = pool.state
    assert(st.connections == 0, s"reference asserts connections == 0: $st")
    assert(st.idleConnections == 0,
      s"reference asserts idle_connections == 0: $st")
  }

  test("release rolls back uncommitted work and restores autoCommit") {
    val url = freshDb("txn")
    val o = opts(url)
    val c1 = GraftConnections.open(o)
    c1.setAutoCommit(false)
    val st1 = c1.createStatement()
    st1.executeUpdate("INSERT INTO T VALUES (99)")
    st1.close()
    GraftConnections.close(c1) // no commit: release must roll back
    GraftConnections.withConnection(o) { c2 =>
      assert(c2.getAutoCommit, "autoCommit not restored on reuse")
      val rs = c2.createStatement().executeQuery(
        "SELECT COUNT(*) FROM T WHERE K = 99")
      rs.next(); assert(rs.getLong(1) == 0, "uncommitted insert leaked")
    }
  }

  test("command=pool_state exposes the JVM's pool as a queryable table") {
    val spark = SparkTestSession.spark
    val url = freshDb("state")
    val o = opts(url)
    // park one idle connection, then introspect through the connector
    GraftConnections.withConnection(o)(_ => ())
    val row = spark.read.format("graft-remote")
      .option("url", url).option("command", "pool_state")
      .load().collect().head
    assert(row.getString(0) == url)
    assert(row.getInt(1) >= 1, "expected at least the parked connection")
    assert(row.getInt(2) >= 0 && row.getInt(2) <= row.getInt(1))
    // unknown commands fail loudly
    intercept[Exception] {
      spark.read.format("graft-remote")
        .option("url", url).option("command", "nope").load()
    }
  }

  test("a drained pool is replaced on next use instead of silently not pooling") {
    val url = freshDb("drainreuse")
    val o = opts(url)
    val drained = GraftConnectionPool.poolFor(o)
    GraftConnections.withConnection(o)(_ => ())
    drained.drain()
    // next use must NOT get the closed pool (which would degrade to
    // open/close-per-checkout with no pooling and no warning)
    val fresh = GraftConnectionPool.poolFor(o)
    assert(fresh ne drained, "poolFor returned the drained pool")
    GraftConnections.withConnection(o)(_ => ())
    GraftConnections.withConnection(o)(_ => ())
    assert(fresh.physicalOpens.get == 1,
      s"expected warm reuse in the replacement pool, opens=${fresh.physicalOpens.get}")
    val st = GraftConnectionPool.state(o)
    assert(st.connections == 1 && st.idleConnections == 1, s"state $st")
  }

  test("sweepLeaked reclaims slots of connections closed behind the pool's back") {
    val url = freshDb("leak")
    val o = opts(url, "poolmaxsize" -> "2", "poolcheckouttimeout" -> "300")
    GraftConnectionPool.drainAll()
    val pool = GraftConnectionPool.poolFor(o)
    // two borrowed connections closed DIRECTLY (bypassing
    // GraftConnections.close): their borrowed-map entries and live
    // slots leak until the reaper sweep evicts them
    val c1 = GraftConnections.open(o)
    val c2 = GraftConnections.open(o)
    c1.close(); c2.close()
    assert(pool.state.connections == 2, s"pre-sweep ${pool.state}")
    // with both slots leaked, a checkout would time out
    intercept[java.sql.SQLTransientConnectionException] {
      GraftConnections.open(o)
    }
    val evicted = GraftConnections.sweepLeaked()
    assert(evicted >= 2, s"evicted $evicted") // other suites may leak too
    assert(pool.state.connections == 0, s"post-sweep ${pool.state}")
    // capacity restored: checkout succeeds again
    GraftConnections.withConnection(o) { c =>
      val rs = c.createStatement().executeQuery("SELECT COUNT(*) FROM T")
      rs.next(); assert(rs.getLong(1) == 3)
    }
    // balance the global open/close counters the direct closes skipped
    // (AFTER the sweep, so nothing double-releases into the pool —
    // other suites assert opened == closed parity)
    GraftConnections.close(c1); GraftConnections.close(c2)
  }

  test("pool=false bypasses pooling (physical close per task)") {
    val url = freshDb("nopool")
    val o = opts(url, "pool" -> "false")
    val c = GraftConnections.open(o)
    GraftConnections.close(c)
    assert(c.isClosed, "unpooled connection must close physically")
    assert(GraftConnectionPool.state(o) == PoolState(0, 0))
  }
}
