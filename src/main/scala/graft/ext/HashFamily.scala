package graft.ext

/** Signature hash-family selector for the near-duplicate product paths
  * (MinHash signatures, SimHash fingerprints, and their streaming forms).
  *
  *  - [[HashFamily.Md5]] — the GATE family (default): one md5 per token /
  *    shingle, recomputable bit-exactly in DuckDB (`md5_number_upper/
  *    lower`), which is what makes `d_minhash_pairs` / `d_simhash` /
  *    `d_minhash_clusters` hash-exact oracle rows rather than rows-only.
  *  - [[HashFamily.Xx]] — the THROUGHPUT family: seeded `xxhash64`
  *    natives, zero-allocation per hash (no 16-byte digest), Spark-only.
  *    At 100 TB the signature pass is per-token CPU-bound, so a run that
  *    does not need DuckDB derivability should select this family.
  *
  * Both families are native codegen Expressions with HOF-equivalence
  * specs (ExtSpec "bit-identical to their HOF folds"); the banding,
  * candidate-join, and store semantics downstream are family-agnostic.
  * Mixing families across a store/run boundary is a semantic error (band
  * keys won't match anything) — pick one per corpus pass.
  */
sealed trait HashFamily

object HashFamily {
  /** md5-derived, DuckDB-recomputable — correctness-gate default. */
  case object Md5 extends HashFamily
  /** seeded xxhash64 — fastest per token, Spark-only. */
  case object Xx extends HashFamily
}
