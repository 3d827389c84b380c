package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Custom-state streaming: online near-duplicate suppression over a
 * document stream via `flatMapGroupsWithState` — the streaming twin of
 * [[graft.pipeline.Dedup]]'s batch detectors, and the
 * `KeyValueGroupedDataset` custom-state shape the builder brief calls
 * for.
 *
 * Documents are grouped by a cheap routing key (SimHash band — same
 * banding as the batch path, so a near-dup pair lands in the same
 * group with the pigeonhole guarantee); per-group state keeps the set
 * of seen SimHashes; an arriving doc within `maxHamming` of any seen
 * signature is emitted as a duplicate, otherwise as a first-seen.
 * State is bounded per group and expires with processing-time timeout.
 */
object StatefulDedup {

  final case class DocIn(band_key: Long, doc_key: String, simhash: Long)
  final case class DocOut(doc_key: String, is_duplicate: Boolean, dup_of: String)
  final case class BandState(seen: List[(String, Long)])

  /** Route a simhashed doc to its 4 band groups (16 bits each). */
  def bandKeys(simhash: Long): Seq[Long] =
    (0 until 4).map(j => (j.toLong << 16) | ((simhash >>> (j * 16)) & 0xFFFFL))

  def process(maxHamming: Int, maxStatePerBand: Int = 1024,
              stateTtl: Option[String] = Some("1 hour"))(
      bandKey: Long, docs: Iterator[DocIn],
      state: GroupState[BandState]): Iterator[DocOut] = {
    if (state.hasTimedOut) {
      state.remove()
      return Iterator.empty
    }
    var seen = state.getOption.map(_.seen).getOrElse(Nil)
    val out = scala.collection.mutable.ListBuffer.empty[DocOut]
    docs.toSeq.sortBy(_.doc_key).foreach { d =>
      val dup = seen.find { case (_, sig) =>
        java.lang.Long.bitCount(sig ^ d.simhash) <= maxHamming
      }
      dup match {
        case Some((origKey, _)) => out += DocOut(d.doc_key, is_duplicate = true, origKey)
        case None =>
          out += DocOut(d.doc_key, is_duplicate = false, "")
          seen = ((d.doc_key, d.simhash) :: seen).take(maxStatePerBand)
      }
    }
    state.update(BandState(seen))
    stateTtl.foreach(state.setTimeoutDuration)
    out.iterator
  }

  /**
   * Wire the stateful dedup over a (doc_key, simhash) stream: explode
   * to band groups and run one stateful operator (streaming queries
   * allow a single flatMapGroupsWithState). Each doc yields one
   * decision PER BAND; it is a duplicate iff ANY band flagged it —
   * that reduction is a stateless `GROUP BY doc_key` the consumer (or
   * a foreachBatch sink) applies. The shuffle key is the band —
   * bounded groups, bounded state, processing-time TTL.
   *
   * `stateTtl = None` disables the processing-time timeout. Use that
   * for drain-style runs (`Trigger.AvailableNow`): with a
   * ProcessingTimeTimeout registered, Spark's `shouldRunAnotherBatch`
   * answers true on every clock advance, so an AvailableNow query
   * NEVER terminates on its own — it keeps scheduling empty batches
   * until the JVM dies (observed as hundreds of epochs and a
   * stopped-SparkContext/INTERNAL_ERROR at shutdown). TTL is for
   * continuous (ProcessingTime-trigger) pipelines, where expiring idle
   * bands is exactly what bounds total state.
   */
  def dedupDecisions(spark: SparkSession, docs: Dataset[(String, Long)],
                     maxHamming: Int = 3,
                     stateTtl: Option[String] = Some("1 hour")): Dataset[DocOut] = {
    import spark.implicits._
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs.flatMap { case (key, sim) =>
      bandKeys(sim).map(bk => DocIn(bk, key, sim))
    }
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append(),
        timeout)(process(maxHamming, stateTtl = stateTtl))
  }
}
