package graft.model

/** Typed row models (SURVEY.md §1.2). Field names are snake_case on purpose:
  * Dataset[T] column names then match the at-rest parquet schema and the
  * DuckDB oracle SQL exactly (driver compare is column-name-sensitive).
  */
final case class Seed(url: String, priority: Double)

final case class FrontierEntry(
    url: String,
    url_canon: String,
    url_hash: Long,
    host: String,
    path: String,
    priority: Double)

final case class SeenEntry(url_hash: Long, host: String, first_epoch: Int)

final case class RobotsRule(allow: Boolean, prefix: String)

final case class RobotsEntry(
    host: String,
    rules: Seq[RobotsRule],
    fetched_epoch: Int,
    crawl_delay_ms: Long,
    host_budget: Int)

/** One politeness-scheduled fetch slot (output of the frontier job). */
final case class Scheduled(
    url_canon: String,
    url_hash: Long,
    host: String,
    path: String,
    priority: Double,
    slot: Int,
    scheduled_at_ms: Long,
    epoch: Int)

/** A row of the primary image+caption table (BASELINE.json input_hint)
  * plus the epoch snapshot-partition column.
  */
final case class Snapshot(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long,
    epoch: Int)

final case class Revision(
    image_id: String,
    epoch: Int,
    prev_epoch: Int, // -1 when change == "new"
    change: String,  // new | unchanged | revised_pixels | revised_caption | revised_both
    phash_dist: Int,
    caption_dist: Int)

/** One fetch-wave result row: the Snapshot payload plus fetch/parse
  * accounting (north_rule "per-partition lineage and fetch/parse metrics").
  * `partition_id` is the PHYSICAL fetch-task partition (the wave is
  * explicitly hash-partitioned on url_hash, so the same id is computable
  * for rows that never reached the wave — see Snapshots.fetchPartitionId);
  * `elapsed_ms` is wall-clock into that task when this row completed
  * (monotone per task, so max() per partition == task wall time).
  * Failed rows carry null payload columns and a non-"parsed" status.
  */
final case class Fetched(
    image_id: String,
    bytes: Array[Byte],
    w: Int,
    h: Int,
    fmt: String,
    caption: String,
    phash: Long,
    epoch: Int,
    partition_id: Int,
    status: String, // parsed | fetch_failed | parse_failed
    elapsed_ms: Long)

/** Per-partition lineage + metrics manifest row (north_rule clause;
  * SURVEY.md §1.2 schema). Counter semantics, all for ONE fetch partition
  * (rows route to partitions by hash(url_hash) — dedupe drops are
  * attributed to the partition they WOULD have fetched in):
  *   n_scheduled — rows that entered this fetch task
  *   n_deduped   — frontier candidates dropped before scheduling
  *                 (in-batch duplicate collapse + URL-seen-set hits)
  *   n_fetched   — fetch attempts that returned content
  *   n_parsed    — fetched rows that parsed into a snapshot row
  *   n_failed    — scheduled rows that produced no snapshot
  *   wall_ms     — fetch-task wall time (max per-row elapsed)
  * Ranges are over the PARSED at-rest columns they describe (None when a
  * partition parsed nothing): the perceptual hash and the url_hash of the
  * snapshot's image_id.
  */
final case class PartitionLineage(
    epoch: Int,
    partition_id: Int,
    n_scheduled: Long,
    n_deduped: Long,
    n_fetched: Long,
    n_parsed: Long,
    n_failed: Long,
    wall_ms: Long,
    min_phash: Option[Long],
    max_phash: Option[Long],
    min_url_hash: Option[Long],
    max_url_hash: Option[Long])

/** One opaque multimodal asset (builder brief: image/audio/video as opaque
  * binary columns with typed metadata; the payload is a deterministic
  * synthetic container — functions/MediaKit.scala — standing in for real
  * encoded media, with the decode stub clearly isolated there).
  */
final case class MediaRow(
    media_id: String,
    kind: String, // "video" | "audio"
    bytes: Array[Byte],
    duration_ms: Long,
    fps: Int, // video only (0 for audio)
    sample_rate: Int, // audio only (0 for video)
    n_frames: Int) // frames (video) or samples (audio)

/** Per-sampled-frame features (video frame-sample operator). */
final case class FrameFeature(
    media_id: String,
    frame_idx: Int,
    ts_ms: Long,
    phash: Long,
    mean_lum: Double)

/** Per-window audio features (1-second tumbling windows). */
final case class AudioWindow(
    media_id: String,
    window_idx: Int,
    rms: Double,
    zcr: Double)
