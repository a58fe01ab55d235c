package graft.sources

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** `DELETE FROM` pushdown (SupportsDeleteV2): the compiled predicate
  * runs remotely as ONE DELETE statement — no rows cross the wire.
  * Opt-in via `allowdelete=true`; default keeps the reference's
  * append-only posture. */
class DeleteSpec extends AnyFunSuite {

  private var n = 0
  private def freshCatalog(): (String, String) = {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = s"jdbc:derby:/tmp/graft_del_${System.nanoTime()};create=true"
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.executeUpdate("CREATE TABLE T (K INT, NAME VARCHAR(32))")
    (1 to 10).foreach(i =>
      st.executeUpdate(s"INSERT INTO T VALUES ($i, 'row_$i')"))
    st.close(); c.close()
    val spark = SparkTestSession.spark
    n += 1
    val cat = s"delcat$n"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.url", url)
    spark.conf.set(s"spark.sql.catalog.$cat.allowdelete", "true")
    (cat, url)
  }

  private def keys(cat: String): Seq[Int] = {
    val spark = SparkTestSession.spark
    spark.sql(s"SELECT K FROM $cat.APP.T ORDER BY K")
      .collect().map(_.getInt(0)).toSeq
  }

  test("pushed predicate deletes remotely; survivors intact") {
    val (cat, url) = freshCatalog()
    val spark = SparkTestSession.spark
    spark.sql(s"DELETE FROM $cat.APP.T WHERE K > 7 OR NAME = 'row_2'")
    assert(keys(cat) == Seq(1, 3, 4, 5, 6, 7))
    // and it really happened remotely (read outside Spark)
    val c = DriverManager.getConnection(url)
    val rs = c.createStatement().executeQuery("SELECT COUNT(1) FROM T")
    rs.next(); assert(rs.getLong(1) == 6); rs.close(); c.close()
  }

  test("unconditional DELETE clears the table (no WHERE rendered)") {
    val (cat, _) = freshCatalog()
    val spark = SparkTestSession.spark
    spark.sql(s"DELETE FROM $cat.APP.T")
    assert(keys(cat).isEmpty)
  }

  test("DELETE without allowdelete=true is rejected with guidance") {
    val (cat, _) = freshCatalog()
    val spark = SparkTestSession.spark
    spark.conf.unset(s"spark.sql.catalog.$cat.allowdelete")
    // catalogs cache their initialize()-time options; re-register under
    // a fresh name so the removal takes effect
    val cat2 = cat + "x"
    spark.conf.set(s"spark.sql.catalog.$cat2", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat2.url",
      spark.conf.get(s"spark.sql.catalog.$cat.url"))
    val e = intercept[Exception] {
      spark.sql(s"DELETE FROM $cat2.APP.T WHERE K > 5")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("allowdelete")), msgs(e))
    // nothing was deleted
    assert(keys(cat) == (1 to 10))
  }

  test("an uncompilable predicate fails loudly, never partially") {
    val (cat, _) = freshCatalog()
    val spark = SparkTestSession.spark
    intercept[Exception] {
      // rand() is nondeterministic — untranslatable to a source filter
      spark.sql(s"DELETE FROM $cat.APP.T WHERE K > 10 * rand()")
    }
    assert(keys(cat) == (1 to 10))
  }
}
