package graft.core

/** Typed view of the fixed repo-change payload + position — for the
  * `Dataset[T]`/`KeyValueGroupedDataset` operators where the schema is
  * static (the generic engine works on `DataFrame` + `StructType`,
  * SURVEY.md §1.1). Field set mirrors the flat change log:
  * payload (repo, path, commit, lang, content) per BASELINE.json
  * input_hint, position (op, part, lsn, ts_ms) per §1.2.
  */
final case class RepoEvent(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String,
    op: String,
    part: Int,
    lsn: Long,
    ts_ms: Long)
