package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time per-domain quota: admit at most `cap` documents per
  * registrable domain across the LIFETIME of the stream — the crawl-
  * politeness twin of the batch `corpus_domain_cap`. The batch operator
  * is the curation-time cap (keep the K BEST by quality, needs the
  * whole corpus); this is the ingest-time quota (admit the FIRST K by
  * deterministic order, needs only a counter) — the two compose:
  * quota at ingest bounds what any domain can flood into the lake,
  * quality-cap at curation picks the keepers from what landed.
  *
  * State per key is ONE long (admitted count), so total state is
  * |domains| counters — bounded model state, never corpus-sized, and
  * it never times out (a quota is lifetime semantics; the counter must
  * survive idle periods, so no watermark/timeout reclaims it).
  *
  * Determinism: within a micro-batch the group's rows are admitted in
  * ascending `docId` order, so a replayed epoch admits the identical
  * set — the property the exactly-once sinks downstream rely on.
  */
object StreamDomainCap {

  final case class Doc(docId: Long, domain: String)
  final case class Admitted(docId: Long, domain: String, nth: Long)

  def admit(docs: Dataset[Doc], cap: Long): Dataset[Admitted] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.domain)
      .flatMapGroupsWithState[Long, Admitted](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[Doc], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[Admitted]
          rows.toSeq.sortBy(_.docId).foreach { d =>
            if (n < cap) {
              n += 1
              out += Admitted(d.docId, domain, n)
            }
          }
          state.update(n)
          out.result().iterator
      }
  }
}
