package graft.core

/** A lazily-evaluated result plus an explicit handle over the cached
  * state backing it. The pair-mining operators persist an internal
  * table (shingles, frame hashes) consumed by several branches of one
  * job; the default entry points leave that cache to age out of the
  * LRU store, which is right for one-shot batch jobs but accumulates
  * entries in a long-running service that calls them repeatedly. The
  * `*Releasable` variants return this handle so such callers can
  * `release()` after their terminal action completes.
  *
  * `release()` is safe at any point — Spark recomputes an unpersisted
  * lineage — but releasing BEFORE the action simply forfeits the
  * sharing the persist existed for. Idempotent; never throws.
  */
final case class Releasable[A](result: A, release: () => Unit)
