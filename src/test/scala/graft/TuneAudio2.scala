package graft

import graft.multimodal.MultimodalOps._

/** Pure-JVM stage isolation for the m04 sf1 anomaly: encode and decode
  * 5000 WAV payloads outside Spark, single-threaded and with 32
  * threads. Run: `sbt "Test/runMain graft.TuneAudio2"`. */
object TuneAudio2 {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val texts = Array.tabulate(n)(i =>
      ("word%04d ".format(i % 997) * 40).getBytes("UTF-8"))
    def mk(i: Int): Array[Byte] = {
      val (ns, sr) = audioDims(i.toLong)
      syntheticWav(texts(i), ns, sr)
    }
    // warm
    (0 until n).foreach(i => decodePcm16(mk(i)))
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag: median ${ts.sorted.apply(1)}%.3fs")
    }
    val payloads = Array.tabulate(n)(mk)
    time("encode only, 1 thread") { (0 until n).foreach(mk) }
    time("decode only, 1 thread") { payloads.foreach(p => decodePcm16(p)) }
    time("decode only, 32 threads") {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
      val futs = payloads.map(p => pool.submit(new Runnable {
        def run(): Unit = { decodePcm16(p); () }
      }))
      futs.foreach(_.get())
      pool.shutdown()
    }
    time("md5 of pcm, 1 thread") {
      val md = java.security.MessageDigest.getInstance("MD5")
      payloads.foreach { p => md.reset(); md.digest(p) }
    }
  }
}
