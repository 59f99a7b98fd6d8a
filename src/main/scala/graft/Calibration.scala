package graft

/** Shared CPU calibration probes for the measurement mains (Bench,
  * Soak). The committed idle references — ~0.80 s single-thread /
  * ~0.22 s for the 32-thread parallel probe on the 32-vCPU bench box —
  * are pinned to EXACTLY these loop shapes (400M / 32×100M rounds of
  * the splitmix64 mixing function: pure register arithmetic, no
  * allocation, no memory traffic), so the loop constants and the
  * references move only together, in one place.
  *
  * [[AbProbe]] deliberately keeps its own verbatim private copies: that
  * file is a self-contained single-source probe designed to be dropped
  * into OLDER checked-out trees (which have no Calibration object) for
  * interleaved A/B sessions.
  */
object Calibration {
  def mixRounds(seed: Long, rounds: Long): Long = {
    var h = 0x9e3779b97f4a7c15L ^ seed
    var i = 0L
    while (i < rounds) {
      h ^= i; h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      i += 1
    }
    h
  }

  /** Fixed single-thread CPU-bound probe (400M rounds, ~0.80 s idle).
    * Senses single-core pressure and cgroup throttling. */
  def calibrationSecs(): Double = {
    val t0 = System.nanoTime()
    if (mixRounds(0L, 400000000L) == 42L) System.out.print("") // defeat DCE
    (System.nanoTime() - t0) / 1e9
  }

  /** All-cores probe: `threads` × 100M rounds (~0.22 s idle at 32
    * threads on 32 vCPUs). Fixed thread count — it measures the
    * MACHINE's aggregate capacity, not the session's cpu setting, and
    * stretches whenever total compute throughput is down: the failure
    * mode the single-thread probe cannot see. */
  def calibrationParallelSecs(threads: Int = 32): Double = {
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { k =>
      val t = new Thread(() => {
        if (mixRounds(k.toLong, 100000000L) == 42L) System.out.print("")
      })
      t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }
}
