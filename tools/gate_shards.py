"""Sharded full-surface oracle gate: run the whole query surface as N
fresh-JVM shards of tools/run_oracle_gate.py and merge into ONE
ORACLE_GATE.json identical in schema to a single full run.

Why (r11 VERDICT item 7): the full gate is ~450 s in one JVM and grows
linearly with the surface; regeneration every round is the correctness
discipline, so it must stay cheap to re-run and cheap to RETRY — a
transient failure in one shard re-runs ~85 queries, not 344. Shard
assignment is the bench_shards crc32 hash (stable as the surface grows);
each shard writes a scoped artifact to its own temp file and the merger
asserts the union covers the full surface exactly once.

Usage:
    python tools/gate_shards.py                 # 4 shards -> ORACLE_GATE.json
    SPARK_GRAFT_GATE_SHARDS=6 python tools/gate_shards.py
    SPARK_GRAFT_GATE_SF_DIR=... SPARK_GRAFT_GATE_OUT=... as in run_oracle_gate
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_shards import shard_of  # noqa: E402


def main() -> None:
    from beacon_indexer_spark.plans.queries import QUERIES

    n_shards = int(os.environ.get("SPARK_GRAFT_GATE_SHARDS", "4"))
    sf_dir = os.environ.get(
        "SPARK_GRAFT_GATE_SF_DIR", "/root/testdata/sf0.01"
    )
    out_path = os.environ.get(
        "SPARK_GRAFT_GATE_OUT", os.path.join(REPO, "ORACLE_GATE.json")
    )
    names = sorted(QUERIES)
    shards: list[list[str]] = [[] for _ in range(n_shards)]
    for n in names:
        shards[shard_of(n, n_shards)].append(n)

    merged: dict[str, dict] = {}
    t0 = time.time()
    for i, shard in enumerate(shards):
        if not shard:
            continue
        print(f"gate shard {i}: {len(shard)} queries", flush=True)
        with tempfile.NamedTemporaryFile(
            suffix=".json", delete=False
        ) as tf:
            tmp_out = tf.name
        try:
            env = dict(
                os.environ,
                SPARK_GRAFT_GATE_ONLY=",".join(shard),
                SPARK_GRAFT_GATE_OUT=tmp_out,
                SPARK_GRAFT_GATE_SF_DIR=sf_dir,
            )
            # one retry: a transient JVM failure must not cost the round
            # its gate artifact (run_oracle_gate exits non-zero on any
            # MISMATCH too — that propagates after the retry)
            for attempt in (1, 2):
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.join(REPO, "tools", "run_oracle_gate.py"),
                    ],
                    env=env,
                    cwd=REPO,
                    stdout=subprocess.DEVNULL,
                    stderr=subprocess.DEVNULL,
                )
                # rc != 0 with a parseable artifact means real MISMATCHes
                # (worth merging + reporting), not a crashed shard
                try:
                    with open(tmp_out) as f:
                        sub = json.load(f)
                    break
                except (json.JSONDecodeError, OSError):
                    print(
                        f"gate shard {i} attempt {attempt} produced no "
                        f"artifact (rc={proc.returncode})",
                        flush=True,
                    )
                    sub = None
            if sub is None:
                raise SystemExit(f"gate shard {i} failed twice")
            for k, v in sub["results"].items():
                if k in merged:
                    raise SystemExit(
                        f"query {k} appeared in two shards — "
                        f"shard assignment broken"
                    )
                merged[k] = v
        finally:
            os.unlink(tmp_out)

    missing = set(names) - set(merged)
    if missing:
        raise SystemExit(f"shards missed queries: {sorted(missing)[:5]}...")
    n_ok = sum(
        1 for r in merged.values()
        if r["rows_match"] and r["schema_match"] and r["values_match"]
    )
    artifact = {
        "sf_dir": sf_dir,
        "n_queries": len(merged),
        "n_match": n_ok,
        "elapsed_sec": round(time.time() - t0, 1),
        "sharded": True,
        "n_shards": n_shards,
        "results": merged,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(merged)} match -> {out_path}")
    sys.exit(0 if n_ok == len(merged) else 1)


if __name__ == "__main__":
    main()
