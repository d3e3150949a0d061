package graft

import java.nio.file.{Files, Path, Paths}

/** Scratch-space router for the harness's EPHEMERAL directories —
  * streaming checkpoints, replay split files, foreachBatch partials,
  * bucketed-table scratch. These dirs live only for one JVM (every
  * call site registers deletion) and are pure harness state: a real
  * deployment passes a durable `checkpointLocation` on reliable
  * storage, but a bounded replay-to-memory-sink twin re-creates its
  * checkpoint from scratch every run, so its only requirement is
  * "fast local scratch".
  *
  * Resolution order (guide §6 — put ephemeral I/O on the fastest
  * local medium available):
  *   1. `SPARK_GRAFT_EPHEMERAL_DIR` (explicit override — a cluster
  *      deployment points this at its local SSD scratch);
  *   2. `/dev/shm` when it exists and is writable (Linux tmpfs: the
  *      checkpoint WAL/commit-log writes and state-store delta files
  *      become memory writes — measured A/B in OPTIMIZATION_r17.md);
  *   3. `java.io.tmpdir` (the pre-r17 behavior, and the portable
  *      fallback).
  *
  * NOT routed to tmpfs: anything persisted across runs (nothing is —
  * see the no-caching rule in OPTIMIZATION_r17.md), the driver's
  * input fixtures (`/root/testdata` stays the driver's contract), and
  * DATA-SIZED scratch (ScaleBench's scaled-table copies, the
  * per-format document materializations) — those go through
  * [[dataDir]], which prefers `java.io.tmpdir` so a memory-backed
  * `/dev/shm` is never asked to hold a table copy at a high scale
  * factor (ADVICE r17). Checkpoint/metadata-log/partials scratch
  * (KB-to-MB-sized) stays on the shm-preferring [[dir]] route.
  */
object Ephemeral {

  /** Resolved once per JVM; all scratch dirs share one base so the
    * shutdown-hook cleanup story stays what it was (per-dir hooks).
    */
  lazy val base: Path = {
    val fromEnv = sys.env.get("SPARK_GRAFT_EPHEMERAL_DIR").map(Paths.get(_))
    val shm = Paths.get("/dev/shm")
    val chosen = fromEnv.orElse {
      if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm) else None
    }.getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    // one per-JVM subdir keeps concurrent JVMs and leftover crash
    // debris apart, and gives cleanup a single root
    val root = Files.createTempDirectory(chosen, "graft-ephemeral-")
    sys.addShutdownHook {
      try {
        import scala.jdk.CollectionConverters._
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } catch { case _: Exception => () }
    }
    root
  }

  /** Drop-in for `Files.createTempDirectory(prefix)` on the scratch
    * base. */
  def dir(prefix: String): Path = Files.createTempDirectory(base, prefix)

  /** Base for DATA-SIZED ephemeral dirs: `SPARK_GRAFT_EPHEMERAL_DIR`
    * if set, else `java.io.tmpdir` — never the tmpfs default, which a
    * scaled table copy could exhaust (ADVICE r17). Same per-JVM
    * subdir + shutdown-hook cleanup story as [[base]].
    */
  lazy val dataBase: Path = {
    val chosen = sys.env.get("SPARK_GRAFT_EPHEMERAL_DIR").map(Paths.get(_))
      .getOrElse(Paths.get(System.getProperty("java.io.tmpdir")))
    val root = Files.createTempDirectory(chosen, "graft-ephemeral-data-")
    sys.addShutdownHook {
      try {
        import scala.jdk.CollectionConverters._
        if (Files.exists(root))
          Files.walk(root).iterator().asScala.toSeq.reverse
            .foreach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } catch { case _: Exception => () }
    }
    root
  }

  /** [[dir]] for data-sized artifacts (table copies, per-format
    * document materializations) — disk-backed, not tmpfs.
    */
  def dataDir(prefix: String): Path = Files.createTempDirectory(dataBase, prefix)
}
