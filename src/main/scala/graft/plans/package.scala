package graft

/** Decision record (SURVEY.md §4): no custom `LogicalPlan`,
  * `Rule[LogicalPlan]` or `SparkStrategy` is required for capability
  * parity with the reference.
  *
  *  - All joins (§2.3), windows (§2.5), set ops (§2.7) and groupings
  *    (§2.4) lower to built-in Catalyst operators; predicate/projection
  *    pushdown, join reordering, broadcast selection, scalar-subquery
  *    rewrite and partition pruning come for free.
  *  - The custom surface that IS needed lives one level down: typed
  *    `Aggregator`s ([[graft.functions.RobustStats]]) and three native
  *    codegen `Expression`s registered through `SparkSessionExtensions`
  *    ([[graft.GraftExtensions]]): [[graft.expressions.PolyHash]] (the
  *    fingerprint/minhash primitive), [[graft.expressions.FloatDot]]
  *    (the embedding-similarity kernel), and
  *    [[graft.expressions.SortedIntersectCount]] (the fuzzy-dedup
  *    verification kernel). Each replaces an interpreted higher-order-
  *    function pipeline in the per-row/per-pair hot path.
  *  - The as-of join ([[graft.operators.AsOfJoin]]) is expressed as the
  *    distributed union+window form rather than a custom physical
  *    operator: one shuffle on the key, no broadcast requirement, and
  *    Catalyst remains free to plan around it.
  *
  * If a future profile requires it (e.g. rewriting small-grid
  * interpolating lookups into broadcast range joins wholesale), the
  * extension point is already installed — add the rule to
  * [[graft.GraftExtensions]] via `injectOptimizerRule`.
  */
package object plans
