package graft

/** Knob-sweep parity mode (round-9 verdict ask #1).
  *
  * The engine carries default-off scale knobs — serving/100 TB paths
  * whose declared-query twins run the simpler shape by default so the
  * declared plans never change: `semanticNearDups(hierProbe/trainDenom/
  * maxClusterRows)`, `embeddingNearDupsLsh(inlineVerify/maxBucketRows)`,
  * `EmbeddingStore.write(idIndex)` + `knnProbe(directRead)`, and
  * `incrementalNgramPairs(broadcastIncrementShingles)`. Each claims
  * output-identity with its default twin (in the exact configurations
  * below) and pins it with a ScalaTest fixture — but a fixture is not
  * the hash gate.
  *
  * With `SPARK_GRAFT_KNOBS=1` in the environment, the affected declared
  * queries run with the knobs FORCED ON in their output-identical
  * configurations, plus one sweep-only query (`knob_incr_ngram_pairs`)
  * for the knob with no declared twin, so a full `graft.Verify` +
  * DuckDB-parity run verifies the scale paths against the same oracles
  * as the defaults. The driver never sets the env var: the declared
  * surface it sees — names, plans, results — is byte-for-byte what it
  * was. The sweep is part of the round-close ritual (see KNOBSWEEP.md).
  *
  * Output-identical configurations used under force:
  *  - `hierProbe = Some(k)`: nProbe ≥ kSuper = ⌈√k⌉ probes every
  *    super-cell, making two-level assignment bit-identical to flat.
  *  - `trainDenom = Some(1)`: the deterministic 1/1 hash-sample is the
  *    whole corpus — the sampling path with the full training set.
  *  - `maxClusterRows`/`maxBucketRows = Some(2^40)`: the circuit
  *    breakers run their aggregate pass but can never trip at any
  *    verify scale — the sweep exercises the checking code, not the
  *    failure.
  *  - `inlineVerify = true`: spec-pinned output-identical verify shape.
  *  - `idIndex = true` + `directRead = true`: sidecar-resolved pruned
  *    reads, spec-pinned identical to full-discovery probes.
  *  - `broadcastIncrementShingles = true`: the semi-join pushdown
  *    removes only rows the equi-join was about to drop.
  *  - `pruneVerifyByCandidates = true` (round 15): the verify inputs
  *    (hotAll, sizes) semi-joined to the collected candidate ids —
  *    removes only rows the verify joins were about to drop.
  */
object Knobs {
  val forced: Boolean = sys.env.get("SPARK_GRAFT_KNOBS").contains("1")

  /** Breaker bound that can never trip at verify scale. */
  val UncappedRows = 1L << 40

  def opt[T](v: T): Option[T] = if (forced) Some(v) else None
  def uncapped: Option[Long] = opt(UncappedRows)
}
