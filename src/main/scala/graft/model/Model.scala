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

/** Per-partition lineage + metrics manifest row (north_rule clause).
  * Ranges are over the at-rest columns they actually describe: the
  * perceptual hash and the url_hash of the snapshot's image_id.
  */
final case class PartitionLineage(
    epoch: Int,
    partition_id: Int,
    n_rows: Long,
    min_phash: Long,
    max_phash: Long,
    min_url_hash: Long,
    max_url_hash: Long)
