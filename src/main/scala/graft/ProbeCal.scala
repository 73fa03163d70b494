package graft

/** Probe calibration utility: prints N samples of the CPU-integer and
  * memory-bandwidth load probes (the same loops Bench runs before each
  * timed pass) plus a short flagship-shaped quietness witness, so the
  * quiet-host references in Bench.scala can be (re)measured with
  * evidence. Run during a window where the flagship witness is fast.
  *
  * Usage: runMain graft.ProbeCal [samples]
  */
object ProbeCal {
  @volatile private var sink: Long = 0L

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(12)
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      threads, (r: Runnable) => {
        val t = new Thread(r); t.setDaemon(true); t })

    def cpuProbe(): Double = {
      val iters = 3_000_000L
      val t0 = System.nanoTime()
      val fs = (0 until threads).map { tid =>
        pool.submit(new Runnable { def run(): Unit = {
          var x = 0x9E3779B97F4A7C15L + tid
          var i = 0L
          while (i < iters) {
            x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
            i += 1
          }
          sink = x * 0x2545F4914F6CDD1DL
        }})
      }
      fs.foreach(_.get())
      (System.nanoTime() - t0) / 1e9
    }
    val chunks = Array.fill(threads)(Array.tabulate(1 << 20)(i => i.toLong))
    def memProbe(): Double = {
      val t0 = System.nanoTime()
      val fs = (0 until threads).map { tid =>
        pool.submit(new Runnable { def run(): Unit = {
          val a = chunks(tid)
          var s = 0L
          var rep = 0
          while (rep < 4) {
            var i = 0
            while (i < a.length) { s += a(i); i += 8 }
            rep += 1
          }
          sink = s
        }})
      }
      fs.foreach(_.get())
      (System.nanoTime() - t0) / 1e9
    }

    (1 to 3).foreach { _ => cpuProbe(); memProbe() }
    val cpu = Vector.fill(n)(cpuProbe())
    val mem = Vector.fill(n)(memProbe())
    println(f"[probecal] cpu min=${cpu.min}%.4f med=${cpu.sorted.apply(n / 2)}%.4f max=${cpu.max}%.4f")
    println(f"[probecal] mem min=${mem.min}%.4f med=${mem.sorted.apply(n / 2)}%.4f max=${mem.max}%.4f")
    println("[probecal] cpu samples: " + cpu.map(v => f"$v%.4f").mkString(" "))
    println("[probecal] mem samples: " + mem.map(v => f"$v%.4f").mkString(" "))
  }
}
