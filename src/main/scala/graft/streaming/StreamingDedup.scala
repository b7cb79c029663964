package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.functions.{HashFunctions => H, TextFunctions}
import graft.functions.TextFunctions.{tokens => toks}

/** One (band key, document) arrival for streaming MinHash dedup: the
  * event time rides both as the watermark column `ts` and as integral
  * microseconds for exact precedence arithmetic.
  */
final case class BandArrival(band: Long, docId: Long, tsUs: Long,
    ts: Timestamp)

/** Per-band memory: the earliest (tsUs, docId) arrival — the band's
  * "original" — plus the latest event time for the state lease. 24
  * bytes of state per active band, independent of corpus size.
  */
final case class BandMem(minTsUs: Long, minDocId: Long, maxTsUs: Long)

/** Per-(document, band) verdict: `dup` when a strictly
  * (tsUs, docId)-earlier document shared this band within the state
  * lease; `partnerId` is that band's earliest document (-1 when the
  * row IS the earliest seen so far).
  */
final case class BandVerdict(docId: Long, band: Long, dup: Boolean,
    partnerId: Long)

/** Streaming exact dedup: the streaming face of
  * `graft.operators.Dedup.exact`. Rows are keyed by the md5 content
  * fingerprint (same normalization as the batch path) and duplicates are
  * dropped with watermark-bounded state — the only dedup state policy
  * that survives an unbounded stream: state for a fingerprint is held
  * only `delay` past its event time, then reclaimed. A duplicate
  * arriving later than `delay` after the original re-emits; that is the
  * documented trade (bounded state vs perfect recall) and the knob is
  * the watermark delay.
  */
object StreamingDedup {

  /** Append a `fp` fingerprint column and drop in-watermark duplicates.
    * Input must be a streaming DataFrame with an event-time column.
    */
  def dedupByContent(df: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    df.withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming NEAR-dup detection: the streaming face of the batch
    * MinHash banding in [[graft.operators.Dedup.minhashNearDups]],
    * sharing its sketch expressions verbatim (same codegen'd shingle /
    * signature / band-key kernels — one source of truth, so a
    * batch-flagged pair and a stream-flagged pair agree on the bands).
    *
    * Semantics: a document is flagged `dup` when ANY of its LSH bands
    * was already claimed by a strictly (eventTime, docId)-earlier
    * document whose band memory is still inside the watermark lease —
    * first-wins candidate SUPPRESSION, the streaming analog of batch
    * banding's candidate generation. Unlike the batch operator there
    * is no exact-Jaccard verify stage (that would need full shingle
    * sets in state); the flag is tunable by the same S-curve knobs
    * (`numHashes`/`bands`), and `partnerId` hands downstream exact
    * re-scoring the band's earliest claimant for a stateless batch
    * join per micro-batch. "Earlier" is EVENT time with docId as the
    * tie-break, never arrival order, so verdicts are deterministic
    * within a micro-batch and identical to batch banding whenever
    * arrivals respect event-time order across batches. A cross-batch
    * INVERSION (the event-time-later document processed in an earlier
    * batch than its partner) emits that document unflagged — its
    * verdict was sealed before the partner existed in state; the miss
    * window is bounded by the watermark delay, the recall trade any
    * single-pass streaming dedup makes on late data.
    *
    * Scale shape: state is one 24-byte (earliest, latest) record per
    * ACTIVE band bucket — O(distinct bands within the watermark),
    * never O(documents) — and the only shuffle is the groupByKey hash
    * partition on the band key. State is reclaimed two ways: the
    * event-time timeout removes idle bands once the watermark passes
    * `lastSeen + ttlMs`, and a lease check on read ignores (and
    * replaces) a band memory the watermark has already outlived even
    * when the timeout has not fired yet — a duplicate arriving later
    * than the lease re-emits as fresh, the same bounded-state trade
    * [[dedupByContent]] documents for the exact path.
    *
    * Output: one [[BandVerdict]] per (document, band). All of a
    * document's verdicts land in the SAME micro-batch as its arrival,
    * so the per-document reduction (`dup = max(dup) GROUP BY docId`)
    * is a stateless batch aggregation inside `foreachBatch` — no
    * second stateful operator in the stream.
    *
    * `df` must already carry `withWatermark` on `tsCol` (the
    * [[Sessionizer]] contract); `idCol` must be long-castable.
    */
  def nearDupByMinhash(df: DataFrame, idCol: String, textCol: String,
      tsCol: String, ttlMs: Long, shingleWidth: Int = 3,
      numHashes: Int = 32, bands: Int = 16): Dataset[BandVerdict] = {
    require(ttlMs > 0, s"ttlMs must be > 0, got $ttlMs")
    require(numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes)")
    import df.sparkSession.implicits._
    df.select(
        explode(H.bandKeys(
          H.minhashSignature(
            H.wordShingles(toks(col(textCol)), shingleWidth), numHashes),
          bands, numHashes / bands)).as("band"),
        col(idCol).cast("long").as("docId"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("ts"))
      .as[BandArrival]
      .groupByKey(_.band)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(update(ttlMs))
  }

  /** Visible for batch-mode unit testing (flatMapGroupsWithState also
    * runs on batch Datasets, where timeouts never fire, the watermark
    * reads as 0, and the lease therefore never expires).
    */
  private[graft] def update(ttlMs: Long)(band: Long,
      rows: Iterator[BandArrival], state: GroupState[BandMem])
      : Iterator[BandVerdict] = {
    if (state.hasTimedOut) {
      // watermark passed lastSeen + ttl with no new arrivals: the
      // band's memory can never flag anything again
      state.remove()
      return Iterator.empty
    }
    val wm =
      try state.getCurrentWatermarkMs()
      catch { case _: UnsupportedOperationException => 0L } // batch mode
    // lease check on read: a memory the watermark already outlived is
    // expired even when its data-less timeout batch has not run yet
    // (a group receiving data in the very batch its timeout would
    // fire still sees the old state — without this check that state
    // would flag one batch too many)
    var cur = state.getOption.filter(s => s.maxTsUs / 1000 + ttlMs > wm)
    // micro-batch grouping gives arrivals unordered — event-time
    // precedence, docId as the deterministic tie-break
    val sorted = rows.toSeq.sortBy(a => (a.tsUs, a.docId))
    val out = sorted.map { a =>
      val earlier = cur.filter(s =>
        s.minTsUs < a.tsUs ||
          (s.minTsUs == a.tsUs && s.minDocId < a.docId))
      cur = cur match {
        case None => Some(BandMem(a.tsUs, a.docId, a.tsUs))
        case Some(s) =>
          val keepMin = earlier.isDefined
          Some(BandMem(
            if (keepMin) s.minTsUs else a.tsUs,
            if (keepMin) s.minDocId else a.docId,
            math.max(s.maxTsUs, a.tsUs)))
      }
      BandVerdict(a.docId, band, dup = earlier.isDefined,
        partnerId = earlier.map(_.minDocId).getOrElse(-1L))
    }
    cur.foreach { s =>
      state.update(s)
      // event-time timeout: fires once the watermark passes the lease.
      // Clamped to wm+1: a straggler older than ttl can leave
      // maxTsUs/1000 + ttlMs at or below the current watermark, and
      // setTimeoutTimestamp throws IllegalArgumentException for
      // timestamps <= watermark — the clamp degrades that lease to
      // "expire at the next watermark advance" instead of killing the
      // whole streaming query on one late event.
      try state.setTimeoutTimestamp(math.max(s.maxTsUs / 1000 + ttlMs, wm + 1))
      catch { case _: UnsupportedOperationException => () } // batch mode
    }
    out.iterator
  }
}
