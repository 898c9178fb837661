package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuous atomic sequence packing — the streaming face of the batch
  * `corpus_pack_atomic`: documents are assigned to fixed-budget bins AS
  * THEY ARRIVE, a document never splits, and the open bin survives
  * across micro-batches, so the stream's lifetime assignment equals the
  * batch packer run over the same docs in the same order (pinned by
  * `StreamPackAtomicSpec`).
  *
  * State per shard is TWO longs — (open bin id, its fill) — so total
  * state is |shards| pairs: bounded model state, never corpus-sized,
  * and it never times out (an open bin is lifetime semantics; a
  * half-full bin must survive idle periods to accept the next doc).
  *
  * Determinism: within a micro-batch each shard's rows pack in
  * ascending `docId` order, so a replayed epoch assigns identically —
  * the property the exactly-once sinks downstream rely on (the
  * `StreamDomainCap` admission recipe applied to packing).
  */
object StreamPackAtomic {

  final case class Doc(docId: Long, shard: Long, tokens: Long)
  final case class Packed(docId: Long, shard: Long, bin: Long, tokens: Long)

  /** (open bin, fill) per shard; fill < 0 marks "no doc seen yet" so
    * the first document always starts bin 0 — including an oversized
    * one, which sits alone in an overfull bin exactly as in batch. */
  def pack(docs: Dataset[Doc], budget: Long): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.shard)
      .flatMapGroupsWithState[(Long, Long), Packed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (shard: Long, rows: Iterator[Doc], state: GroupState[(Long, Long)]) =>
          var (bin, fill) = state.getOption.getOrElse((0L, -1L))
          val out = Seq.newBuilder[Packed]
          rows.toSeq.sortBy(_.docId).foreach { d =>
            if (fill < 0) { fill = d.tokens }
            else if (fill + d.tokens <= budget) { fill += d.tokens }
            else { bin += 1; fill = d.tokens }
            out += Packed(d.docId, shard, bin, d.tokens)
          }
          state.update((bin, fill))
          out.result().iterator
      }
  }
}
