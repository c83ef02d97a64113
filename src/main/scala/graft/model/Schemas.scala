package graft.model

import java.sql.Timestamp

/** Typed row models (SURVEY.md §1.3). The engine is Dataset/DataFrame-first:
  * these case classes carry the Encoders; StructTypes are derived from them.
  */

/** Input table shape fixed by repo:BASELINE.json input_hint:
  * (url string, warc_ts timestamp, html binary, text string, lang string). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** One extracted, url-normalized link occurrence (multiset — the analog of
  * the reference's raw edge rows before DiGraph collapse, SURVEY.md §2.11.5). */
final case class Link(src: String, dst: String, ts: Timestamp)

/** Deduplicated, id-hashed edge (the checkpointable IR — FIXTURES.md §2). */
final case class Edge(src_id: Long, dst_id: Long, src: String, dst: String)

/** Vertex dictionary entry; `domain` is eTLD+1 (graft.norm.Etld1). */
final case class Vertex(id: Long, url: String, domain: String)
