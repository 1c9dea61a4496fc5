package graft.streaming

import graft.pipeline.CurationRunner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import java.sql.Timestamp

/** The streaming front door of the COMPOSED curation pipeline: every
  * micro-batch of (`doc_id`, `text`) documents runs the full
  * [[CurationRunner.runBatch]] cycle — clean → exact-dedup → release
  * gate → (on release cadence) token-budget cut → shard publish → index
  * refresh — against the same persistent store roots the batch job
  * owns. This is the production cadence the runner's `publish` flag
  * exists for: every batch INGESTS (gate + dedup + corpus landing +
  * BM25 append, all O(batch)), and every `publishEvery`-th batch also
  * RELEASES a fresh curated epoch (a metadata-only prefix-sum pass over
  * ingest-time signals — no release ever re-tokenizes history).
  *
  * Delivery semantics ride the runner's watermark contract, keyed by
  * the micro-batch epoch: epoch ids are assigned monotonically by the
  * engine and map here to monotone `asOf` stamps (`epoch0` + epochId
  * millis) and stable batch ids (`<runId>-<epochId>`). A crash replay
  * re-delivers the SAME epoch id, so either the previous attempt fully
  * committed (watermark guard → byte-identical no-op) or it replays
  * into the same corpus partition / fingerprint store / index buckets
  * idempotently — at-least-once delivery, exactly-once state. An empty
  * micro-batch never enters the runner (no version burns, watermark
  * holds, and a later real batch at the same stamp cannot be shadowed).
  *
  * The one contract the CALLER owns: `epoch0` and `runId` must be
  * fixed per checkpointed stream (restarts resume the same epoch
  * sequence), and a NEW stream over the same root needs an `epoch0`
  * past the committed watermark or its early epochs no-op by design.
  */
object StreamingCurationRunner {

  /** Doc-keyed embeddings ride the same cycle into the ANN store when
    * the stream carries this column (`Array[Float]`, the corpus layout
    * [[CurationRunner.runBatch]] ingests — vec_id = doc id). */
  val EmbeddingCol = "embedding"

  def sink(stream: DataFrame, root: String,
           conf: CurationRunner.Conf = CurationRunner.Conf(),
           publishEvery: Int = 1,
           epoch0: Timestamp = Timestamp.valueOf("2024-01-01 00:00:00"),
           runId: String = "stream",
           maintainEvery: Int = 0): StreamingQuery = {
    require(publishEvery >= 1, s"publishEvery must be >= 1, got $publishEvery")
    require(maintainEvery >= 0,
      s"maintainEvery must be >= 0 (0 = never), got $maintainEvery")
    stream.writeStream
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val embeddings =
            if (!batch.columns.contains(EmbeddingCol)) None
            else Some(batch.filter(col(EmbeddingCol).isNotNull)
              .select(col(conf.idCol).as("vec_id"), col(EmbeddingCol)))
          CurationRunner.runBatch(batch.sparkSession, root,
            batch.drop(EmbeddingCol),
            new Timestamp(epoch0.getTime + epochId + 1),
            s"$runId-$epochId", conf,
            embeddings = embeddings,
            publish = (epochId + 1) % publishEvery == 0)
          // maintenance cadence: between micro-batches the root is
          // quiesced BY CONSTRUCTION (foreachBatch is sequential and the
          // batch above just committed SUCCESS), which is exactly the
          // precondition [[CurationRunner.maintain]] enforces — so the
          // stream can fold its own partition-dir growth without an
          // external job. A batch-ids-per-fold-bucket rate of
          // maintainEvery/buckets keeps listing cost bounded forever.
          if (maintainEvery > 0 && (epochId + 1) % maintainEvery == 0)
            CurationRunner.maintain(batch.sparkSession, root)
          // no cache cleanup: every frame a cycle pins is released on
          // its own path (runBatch unpersists the landed frame, the
          // dedup stores their intermediates), so there is nothing of
          // ours to drop — and a session-global clearCache here would
          // wipe relations unrelated jobs sharing the session cached
        }
        ()
      }
      .start()
  }
}
