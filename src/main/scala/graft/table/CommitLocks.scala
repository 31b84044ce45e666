package graft.table

/** The OCC slot-lock HONESTY contract for object stores.
  *
  * graft's optimistic concurrency (see `CowTable.writeManifest`) hinges on
  * ONE primitive: create-exclusive of `_commits/.v{n}.lock` must admit
  * exactly one winner. That holds on POSIX (`O_CREAT|O_EXCL`), on HDFS
  * (namenode-atomic create), and on object stores whose client performs a
  * CONDITIONAL put (S3 `If-None-Match: *`, GCS `ifGenerationMatch: 0`,
  * ABFS conditional create). It does NOT hold through the stock Hadoop
  * S3A path: `create(path, overwrite = false)` is an exists-check
  * followed by an unconditional PUT, so two racers can both believe they
  * claimed the slot and the loser's manifest silently vanishes — a lost
  * update, the exact failure OCC exists to prevent.
  *
  * Rather than pretend (the reference side-steps the whole question by
  * serializing runs — `maxConcurrentRuns: 1`, lib/glue-stack.ts:48-49),
  * graft makes the deployment state its guarantee explicitly via
  * `spark.graft.commit.objectStoreLocks`:
  *
  *  - unset / `"refuse"` (default): committing to an S3-family scheme
  *    throws with this contract in the message. Safe-by-default: nobody
  *    gets torn commits because they assumed S3 renames/creates behave.
  *  - `"conditional"`: the operator asserts the connector ACTUALLY does
  *    conditional create (e.g. Hadoop ≥ 3.4.1 S3A with
  *    `fs.s3a.create.conditional.enabled`, or a custom FileSystem doing
  *    `If-None-Match`). Claims proceed; exclusivity is the connector's.
  *  - `"best-effort"`: single-writer deployments (the reference's own
  *    model) accept check-then-act claiming; concurrent writers are
  *    documented-unsafe in this mode.
  *
  * The race-exactness of the local-FS path and the refusal/opt-in logic
  * here are pinned by `CommitLockSpec`, and the `conditional` mode is
  * exercised END-TO-END there against `CondCreateS3Fs` — an object-store
  * FileSystem double whose `create(overwrite=false)` is a true
  * conditional create — with two real table writers racing through OCC
  * rebase to the serial-execution state.
  */
object CommitLocks {

  /** Spark conf key selecting the object-store lock mode. */
  val ModeConf = "spark.graft.commit.objectStoreLocks"

  /** Schemes whose stock Hadoop `create(overwrite=false)` is a non-atomic
    * exists-then-PUT. (GCS and ABFS connectors do conditional create and
    * are not listed.)
    */
  val BestEffortCreateSchemes: Set[String] = Set("s3", "s3a", "s3n")

  /** Gate a slot claim on `scheme` under the configured `mode`; throws
    * `UnsupportedOperationException` for S3-family schemes without an
    * explicit opt-in, returns unit otherwise. Kept FS-free so the
    * contract is testable without an object-store client on the
    * classpath.
    */
  def checkScheme(scheme: String, mode: Option[String]): Unit = {
    if (scheme == null || !BestEffortCreateSchemes(scheme)) return
    mode.map(_.trim.toLowerCase) match {
      case Some("conditional") | Some("best-effort") => ()
      case Some("refuse") | None =>
        throw new UnsupportedOperationException(
          s"graft commit on scheme '$scheme': the stock Hadoop client's " +
            "create(overwrite=false) is not atomic, so the OCC slot lock " +
            "cannot guarantee a single winner. Set " +
            s"$ModeConf=conditional if your connector does conditional " +
            "create (S3 If-None-Match, e.g. S3A with " +
            "fs.s3a.create.conditional.enabled), or " +
            s"$ModeConf=best-effort to accept check-then-act locking " +
            "for a SINGLE-writer deployment.")
      case Some(other) =>
        throw new IllegalArgumentException(
          s"$ModeConf: unknown mode '$other' " +
            "(expected refuse | conditional | best-effort)")
    }
  }
}
