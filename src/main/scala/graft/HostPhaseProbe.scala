package graft

import java.util.concurrent.atomic.AtomicLong

/** Host-phase probe for scaling measurements (no Spark dependency).
  *
  * Round-5 diagnosis of the "noise storms" that plagued rounds 3-5
  * N-vs-4N scaling readings (2026-08-18, full trail in BENCH/BASELINE.md):
  *
  *  1. The DOMINANT component was self-inflicted, not host neighbours:
  *     this VM's anonymous-page first-touch path runs at ~30 MB/s per
  *     thread for 4 KB pages (134 s to fault in 4 GB single-threaded —
  *     measured; nested-virt page-zeroing). A fresh JVM whose heap
  *     commits lazily therefore spends its first minutes of measured
  *     work page-faulting in kernel mode (observed: sys 48% vs user 6%
  *     of 32 cores during a 4x8g-executor leg; 1400 s of sys time per
  *     executor). The wide (4N) level pays 4x the faults of the narrow
  *     level, so the ratio reads as "no scaling" (0.15-0.30). Fix:
  *     `-Xms=-Xmx -XX:+AlwaysPreTouch -XX:+UseTransparentHugePages`
  *     (2 MB pages fault 6x faster here; pre-touch moves the cost before
  *     registration). With it, identical 30.76M-pair work cost 1353-1363
  *     task-core-seconds at BOTH 1x4c and 4x4c executor levels —
  *     adjacent-pair scaling efficiency 0.87-1.09 vs 0.15-0.30 before.
  *  2. A residual ~1.5x host phase swing remains (4-core task-core-sec
  *     901 vs 1363 across the same evening, steal time ~zero throughout)
  *     — real, but it no longer flips the verdict because both levels of
  *     an interleaved pair sample it together.
  *
  * Two fixed-work probes characterize the box before/after a measurement:
  *  - `mem`: each unit stride-walks an 8 MB per-thread buffer at cache-line
  *    granularity (1 unit ~ 8 MB of DRAM traffic). Aggregate units/sec at
  *    12 threads: ~15000 (~120 GB/s) measured idle-clean; a concurrent
  *    page-fault storm (or a genuinely contended phase) reads 3-10x lower.
  *  - `cpu`: same harness over a 256 KB L2-resident buffer with heavy
  *    integer mixing — scales linearly with cores (measured 0.94-1.03
  *    4->12 threads even while mem readings were degraded: the degradation
  *    is in the memory system, never hypervisor time-slicing).
  *
  * bench/phase_gate.sh polls `mem` on an idle box and fires the scaling
  * measurement (bench/scale_cluster.sh) only inside a clean window, then
  * re-probes after, so a recorded N-vs-4N ratio carries before/after
  * phase evidence instead of hoping the host cooperated.
  *
  * Usage: graft.HostPhaseProbe <mem|cpu> <threads> <units>
  * Output: one JSON line {"probe":…,"threads":…,"sec":…,"units_per_sec":…}.
  */
object HostPhaseProbe {

  private def runThreads(threads: Int, total: Long)(work: Int => Long): Double = {
    val remaining = new AtomicLong(total)
    val sink = new Array[Long](threads)
    val ts = (0 until threads).map { id =>
      new Thread(() => {
        var h = 0L
        while (remaining.getAndDecrement() > 0) h ^= work(id)
        sink(id) = h
      })
    }
    val t0 = System.nanoTime()
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    if (sink.sum == 42L) print("") // defeat dead-code elimination
    sec
  }

  /** One unit = one cache-line-strided walk of an 8 MB buffer (~8 MB of
    * DRAM traffic — far beyond L3 share at 12 threads). */
  private def memProbe(threads: Int, total: Long): Double = {
    val bufs = Array.tabulate(threads) { id =>
      val b = new Array[Byte](8 << 20)
      new java.util.Random(42 + id).nextBytes(b); b
    }
    runThreads(threads, total) { id =>
      val buf = bufs(id)
      var h = 0L; var k = 0
      while (k < buf.length) { h = h * 31 + buf(k); k += 64 }
      h
    }
  }

  /** One unit = heavy 64-bit mixing over a 256 KB L2-resident buffer. */
  private def cpuProbe(threads: Int, total: Long): Double = {
    val bufs = Array.tabulate(threads) { id =>
      val r = new java.util.Random(42 + id)
      Array.fill(32768)(r.nextLong())
    }
    runThreads(threads, total) { id =>
      val buf = bufs(id)
      var h = 1469598103934665603L; var k = 0
      while (k < buf.length) {
        var v = buf(k) ^ h
        v *= 0x9E3779B97F4A7C15L; v ^= v >>> 29
        v *= 0xBF58476D1CE4E5B9L; v ^= v >>> 32
        h = h * 31 + v
        k += 1
      }
      h
    }
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("mem")
    val threads = args.lift(1).map(_.toInt).getOrElse(12)
    val units = args.lift(2).map(_.toLong).getOrElse(threads * 400L)
    // untimed warmup (JIT + page-in) at ~10% of the work
    val warm = math.max(threads.toLong, units / 10)
    val sec = mode match {
      case "cpu" => cpuProbe(threads, warm); cpuProbe(threads, units)
      case _     => memProbe(threads, warm); memProbe(threads, units)
    }
    println(f"""{"probe":"$mode%s","threads":$threads%d,"sec":$sec%.2f,"units_per_sec":${units / sec}%.1f}""")
  }
}
