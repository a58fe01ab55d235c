package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Round-12 operator additions and fixes. */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("setSimJoinExact keeps pairs with doc ids beyond the double " +
      "mantissa (packed-key unpack is integral, full 39-bit domain)") {
    // round-12 ADVICE: `/` on the packed long id*2^24+sz*2^12+pos went
    // through DOUBLE division; above ~2^29 the pack exceeds the 53-bit
    // mantissa and a saturated low part rounds into the NEXT id. Ids
    // here sit near 2^38 (within the documented 39-bit domain) with
    // low parts forced high by near-identical long docs.
    val base = (1 to 300).map(i => s"tok$i").mkString(" ")
    val idA = (1L << 38) - 3L
    val idB = (1L << 38) - 2L
    val docs = Seq(idA -> base, idB -> (base + " tail"))
      .toDF("doc_id", "text")
    val got = DedupOps.setSimJoinExact(docs, "doc_id", "text", tau = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((idA, idB)), s"got $got")
    CacheRegistry.releaseAll()
  }

  test("containmentJoin keeps directed pairs with ids beyond the " +
      "double mantissa (integral unpack of id*4096+sz)") {
    val long = (1 to 80).map(i => s"w$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"w$i").mkString(" ")
    val idSrc = (1L << 50) + 4095L // low bits saturate the packed size
    val idExc = (1L << 50) + 4096L
    val docs = Seq(idSrc -> long, idExc -> excerpt).toDF("doc_id", "text")
    val got = DedupOps.containmentJoin(docs, "doc_id", "text", tau = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((idExc, idSrc, 1.0)), s"got $got")
    CacheRegistry.releaseAll()
  }
}
