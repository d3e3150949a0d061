package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline checkpoint/state tooling ≙ the reference's `ChangeBackend`
  * batch job (/root/reference/src/main/java/com/ververica/jobs/ChangeBackend.java:156-212),
  * which loads a savepoint, prints operator/keyed state, and rewrites
  * it under another backend.
  *
  * Spark mapping (SURVEY.md §3.2):
  *   - read keyed state ≙ the `statestore` data source over a
  *     checkpoint (returns key/value rows per stateful operator);
  *   - read state topology ≙ the `state-metadata` data source;
  *   - source offsets (≙ the reference's checkpointed virtual clock)
  *     are human-readable JSON under `<ckpt>/offsets/`;
  *   - backend swap (heap ↔ RocksDB) is a restart-time provider
  *     config, not an offline rewrite:
  *     `spark.sql.streaming.stateStore.providerClass =
  *      ...RocksDBStateStoreProvider`. There is no public offline
  *     state *writer* — the reference's bootstrap path also targeted
  *     uids that did not exist (ChangeBackend.java:180,207 vs
  *     TimingExplorer.java:91,100), so restart-from-checkpoint is the
  *     supported migration story.
  */
object StateInspect {

  /** Keyed state of a checkpointed stateful operator as a DataFrame
    * (≙ readKeyedState + PseudoWindowReaderFunction print path).
    */
  def keyedState(spark: SparkSession, checkpointDir: String,
                 operatorId: Int = 0, batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId)
    batchId.foreach(b => r.option("batchId", b))
    r.load(checkpointDir)
  }

  /** Stateful-operator topology of a checkpoint (≙ savepoint metadata). */
  def stateMetadata(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)

  /** Committed source offsets (≙ the reference's checkpointed virtual
    * clock, `checkpointedTime` ListState read at
    * ChangeBackend.java:175-177): one JSON line per source per batch,
    * human-readable — rate-source offsets ARE the virtual clock.
    */
  def sourceOffsets(spark: SparkSession, checkpointDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.text(s"$checkpointDir/offsets")
      .withColumn("file", input_file_name())
      .filter(col("value").startsWith("{"))
  }
}
