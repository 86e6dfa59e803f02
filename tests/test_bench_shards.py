"""bench_shards invariants: hash-stable assignment (a query never moves
shards as the surface grows) and complete partition of the surface."""

from __future__ import annotations

from tools.bench_shards import shard_of


def test_shard_assignment_is_stable_under_surface_growth():
    names = [f"query_{i}" for i in range(300)]
    before = {n: shard_of(n, 4) for n in names}
    grown = names + [f"new_query_{i}" for i in range(25)]
    after = {n: shard_of(n, 4) for n in grown}
    assert all(after[n] == before[n] for n in names)


def test_shards_partition_the_surface():
    from beacon_indexer_spark.plans.queries import QUERIES

    n = 4
    shards = [[] for _ in range(n)]
    for q in sorted(QUERIES):
        shards[shard_of(q, n)].append(q)
    assert sum(len(s) for s in shards) == len(QUERIES)
    assert {q for s in shards for q in s} == set(QUERIES)
    # crude balance: no shard more than 2x the smallest non-empty shard
    sizes = sorted(len(s) for s in shards if s)
    assert sizes[-1] <= 2 * sizes[0]
