package graft.refresh

import graft.schema.SchemaRegistry

/** The refresh manager's poll step (reference: tools/refresh_manager.py:
  * 461-534 — the daemon polls the registry, feeds the priority queue,
  * spawns workers up to a concurrency limit, and allocates throughput).
  *
  * The OS-process management around it (worker spawning, SIGTERM→PAUSED,
  * zombie reaping) is a deployment concern; what the engine owns is the
  * decision function: which catalog jobs start now, and at what rate.
  * Runs entirely off the persisted refresh catalog, so a restarted
  * manager's first tick resumes exactly where the last one stopped
  * (PAUSED resume beats NOT_STARTED start at equal priority).
  */
object RefreshManager {

  final case class Tick(started: Seq[RefreshJob], caps: Map[Int, Int])

  /** One poll: start the per-(namespace, source) queue heads while
    * concurrency allows, mark them IN_PROGRESS in the catalog, and
    * allocate rate caps across everything running after the tick.
    *
    * Every start goes through the registry's atomic
    * `transitionRefresh(id, snapshotStatus, InProgress)`: the decision is
    * made over a snapshot, so an unconditional write-back would (a) roll
    * a concurrently-flushed resume offset backwards — the CAS preserves
    * the STORED offset — and (b) double-start a job a concurrent tick
    * already claimed — the CAS fails and the job is skipped. The
    * one-active-job guard keys on (namespace, source), matching
    * [[PriorityRefreshQueue.schedule]]'s grouping; a bare source-name
    * match would starve same-named sources in other namespaces. */
  def tick(registry: SchemaRegistry, maxConcurrent: Int = 8,
           totalCap: Int = ThroughputAllocator.DefaultTotalCap): Tick = {
    val all = registry.refreshes
    val running = all.filter(_.status == RefreshStatus.InProgress)
    val slots = maxConcurrent - running.size
    val toStart =
      if (slots <= 0) Seq.empty
      else PriorityRefreshQueue.schedule(all)
        .filterNot(j => running.exists(r =>
          r.sourceName == j.sourceName && r.namespaceName == j.namespaceName))
        .take(slots)
    // capped CAS: the snapshot's slot arithmetic is advisory only — the
    // registry re-checks the authoritative running count inside the same
    // lock as the status flip, so two concurrent ticks can never admit
    // past maxConcurrent between them (the snapshot-computed `slots`
    // just bounds how many candidates this tick ATTEMPTS)
    val started = toStart.flatMap(j =>
      registry.startRefreshCapped(j.refreshId, j.status, maxConcurrent))
    // allocate over the AUTHORITATIVE running set, not this tick's
    // snapshot: a concurrent tick's starts would otherwise let both
    // allocations sum to totalCap each
    val runningNow = registry.refreshes.filter(_.status == RefreshStatus.InProgress)
    Tick(started, ThroughputAllocator.allocate(runningNow, totalCap))
  }

  /** Worker-loss handling (refresh_manager.py:273-304 zombie sweep): jobs
    * whose workers died flip to FAILED at their last stored offset so a
    * later requester can re-queue them. The CAS skips any job whose
    * worker raced the sweep with its own terminal update (a GC-paused
    * worker's SUCCESS must not be overwritten to FAILED, nor vice
    * versa). */
  def failLostJobs(registry: SchemaRegistry, lostRefreshIds: Set[Int]): Seq[RefreshJob] =
    lostRefreshIds.toSeq.sorted
      .flatMap(registry.getRefreshById)
      .filter(_.status == RefreshStatus.InProgress)
      .flatMap(j => registry.transitionRefresh(j.refreshId,
        RefreshStatus.InProgress, RefreshStatus.Failed))
}
