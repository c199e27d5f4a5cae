package graft

/** Entry-point log hygiene (round-8 verdict, hygiene item #1).
  *
  * Every unpartitioned window in the library is tiny by construction —
  * post-TakeOrdered top-N cumulative sums, ~20-bucket histograms, k-row
  * RRF fusion (the PlanGuardSpec global-window guard enforces exactly
  * this) — but `WindowExec` cannot know that and logs its
  * "No Partition Defined … single partition" WARN on every execution.
  * The warning is indistinguishable from a real single-task window in
  * logs and burns the driver's line-budgeted stdout capture, so the
  * bench/verify entrypoints raise that package's logger to ERROR. A
  * genuinely corpus-sized global window is caught where it belongs: the
  * PlanGuardSpec structural guard fails the build.
  */
object LogHygiene {
  /** Raise `o.a.s.sql.execution.window` to ERROR — silences the benign
    * "No Partition Defined for Window operation" WARN for plan shapes
    * the guard spec has already proven bounded. */
  lazy val muteBoundedGlobalWindowWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  /** Raise `o.a.s.storage.BlockManager` to ERROR — a re-executed plan
    * over live localCheckpoint blocks logs "Block rdd_N already exists
    * on this machine; not re-adding it" per partition per re-read.
    * Benign (the block IS the intended reuse), but the r18 bench run
    * emitted enough of them to push the result JSON line out of the
    * driver's ~1.9 KB stdout-tail window — `BENCH_r18.json` recorded
    * `"parsed": null` (VERDICT r18 What's-wrong #4). The bench/verify
    * entrypoints mute the logger; a REAL block-manager fault still
    * surfaces at ERROR. */
  lazy val muteBlockExistsWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.storage.BlockManager",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }
}
