"""N-writer optimistic-commit throughput twin (round 14).

tools/contention_twin.py pins the CORRECTNESS of optimistic
multi-writer commits (two OS processes, disjoint-both-land /
overlap-single-wins, both publish backends). This tool pins the
THROUGHPUT claim that motivated the protocol: N writers over DISJOINT
bucket sets must scale — the optimistic commit path may not serialize
them the way the single writer lease did.

Three variants over the SAME logical workload (N writers x M
merge_into rounds, each writer rewriting only its own bucket set):

  serial      one process applies all N*M changes in round-major
              order — the content oracle and the single-writer wall.
  optimistic  N OS processes (own JVM each) run their M merges
              concurrently with NO lease — the r14 commit protocol.
              Version races rebase; nothing conflicts (disjoint).
  lease       the same N processes, but every merge runs under
              acquire_writer_lease(...) — the pre-r14 discipline where
              the whole append holds the table lock.

Disjointness is constructed, not assumed: --setup computes each key's
xxhash64 bucket with Spark once and assigns writer i the keys whose
bucket % N == i, so writer bucket sets partition the bucket space.

The orchestrator (--run) records walls measured from the post-barrier
instant (JVM startup excluded), verifies all three variants' final
table content is IDENTICAL (duckdb read through the current manifest —
disjoint writers commute, so every order must converge), and that the
concurrent variants committed exactly N*M versions. Output JSON is the
round artifact (tools/optimistic_scaling_r14.json).

Scale reading: commits are metadata-sized JSON operations, so the
conflict-check cost per commit is O(concurrent commits since read),
independent of data volume — the speedup measured here at toy data
sizes UNDERSTATES the win at 100 TB, where the lease variant would
serialize multi-minute data writes, not ~1 s ones.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BUCKETS = 32
N_KEYS = 512
KEYS_PER_ROUND = 8


def _get_spark(name: str):
    from python_vectordbapp_ceph_spark.session import get_spark

    spark = get_spark(
        app_name=name, master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _base_rows(spark):
    return spark.createDataFrame(
        [(f"k{i}", i, 0) for i in range(N_KEYS)],
        "key string, val long, ts long",
    )


def _writer_keys(keymap: dict[str, int], n_writers: int, i: int) -> list[str]:
    """Writer i owns every key whose bucket % n_writers == i — bucket
    sets across writers are disjoint by construction."""
    mine = sorted(k for k, b in keymap.items() if b % n_writers == i)
    return mine[:KEYS_PER_ROUND]


def _changes(spark, keys: list[str], writer: int, rnd: int):
    return spark.createDataFrame(
        [(k, (writer + 1) * 1000 + rnd, rnd + 1, "upsert") for k in keys],
        "key string, val long, ts long, op string",
    )


def _wait_for(paths, timeout_s: float = 300.0) -> None:
    t0 = time.time()
    for p in paths:
        while not os.path.exists(p):
            if time.time() - t0 > timeout_s:
                raise TimeoutError(f"marker {p} never appeared")
            time.sleep(0.1)


def cmd_setup(base: str, mdir: str) -> None:
    from python_vectordbapp_ceph_spark.operators import merge as M

    spark = _get_spark("optscale-setup")
    rows = _base_rows(spark)
    M.write_bucketed_base(rows, base, "key", N_BUCKETS)
    keymap = {
        r["key"]: int(r["_kb"])
        for r in M._with_bucket(rows, "key", N_BUCKETS).collect()
    }
    with open(os.path.join(mdir, "keymap.json"), "w") as f:
        json.dump(keymap, f)
    print(json.dumps({"role": "setup", "ok": True}))
    spark.stop()


def cmd_writer(
    base: str, mdir: str, i: int, n_writers: int, rounds: int, use_lease: bool
) -> None:
    from python_vectordbapp_ceph_spark.operators import merge as M

    spark = _get_spark(f"optscale-w{i}")
    keymap = json.load(open(os.path.join(mdir, "keymap.json")))
    keys = _writer_keys(keymap, n_writers, i)

    # pre-warm the JVM outside the measured window (one tiny job) so
    # the walls compare commit-protocol behavior, not startup
    spark.createDataFrame([(1,)], "x int").count()

    with open(os.path.join(mdir, f"w{i}.up"), "w") as f:
        f.write("1")
    _wait_for([os.path.join(mdir, f"w{j}.up") for j in range(n_writers)])

    t0 = time.time()
    per_merge = []
    for r in range(rounds):
        t = time.time()
        if use_lease:
            from python_vectordbapp_ceph_spark.operators.lease import (
                acquire_writer_lease,
            )

            lease = acquire_writer_lease(spark, base, timeout_ms=300_000)
            try:
                M.merge_into(
                    spark, base, _changes(spark, keys, i, r),
                    key_col="key", ts_col="ts", n_buckets=N_BUCKETS,
                )
            finally:
                lease.release()
        else:
            M.merge_into(
                spark, base, _changes(spark, keys, i, r),
                key_col="key", ts_col="ts", n_buckets=N_BUCKETS,
            )
        per_merge.append(round(time.time() - t, 3))
    t1 = time.time()
    with open(os.path.join(mdir, f"w{i}.res.json"), "w") as f:
        json.dump(
            {"writer": i, "t0": t0, "t1": t1, "keys": keys,
             "per_merge_sec": per_merge, "lease": use_lease}, f,
        )
    print(json.dumps({"role": f"w{i}", "ok": True}))
    spark.stop()


def cmd_serial(base: str, mdir: str, n_writers: int, rounds: int) -> None:
    from python_vectordbapp_ceph_spark.operators import merge as M

    spark = _get_spark("optscale-serial")
    rows = _base_rows(spark)
    M.write_bucketed_base(rows, base, "key", N_BUCKETS)
    keymap = {
        r["key"]: int(r["_kb"])
        for r in M._with_bucket(rows, "key", N_BUCKETS).collect()
    }
    spark.createDataFrame([(1,)], "x int").count()
    t0 = time.time()
    for r in range(rounds):
        for i in range(n_writers):
            keys = _writer_keys(keymap, n_writers, i)
            M.merge_into(
                spark, base, _changes(spark, keys, i, r),
                key_col="key", ts_col="ts", n_buckets=N_BUCKETS,
            )
    t1 = time.time()
    with open(os.path.join(mdir, "serial.res.json"), "w") as f:
        json.dump({"t0": t0, "t1": t1}, f)
    print(json.dumps({"role": "serial", "ok": True}))
    spark.stop()


# --- orchestrator (no Spark: duckdb + JSON only) -----------------------------

def _content(path: str) -> frozenset:
    """(key, val) set through the CURRENT manifest — duckdb, no JVM."""
    import duckdb

    commits = sorted(
        n for n in os.listdir(os.path.join(path, "_commits"))
        if n.startswith("v") and n.endswith(".json")
    )
    man = json.load(open(os.path.join(path, "_commits", commits[-1])))
    con = duckdb.connect()
    parts = [
        os.path.join(path, f"gen={g}", f"_kb={b}", "*.parquet")
        for b, g in man["buckets"].items()
    ]
    rows = con.execute(
        "SELECT key, val FROM read_parquet(?)", [parts]
    ).fetchall()
    return frozenset(rows), int(man["version"])


def _launch_writers(work: str, mdir: str, n: int, m: int, lease: bool):
    procs = []
    for i in range(n):
        cmd = [sys.executable, os.path.abspath(__file__), "--writer",
               work, mdir, str(i), str(n), str(m)]
        if lease:
            cmd.append("--lease")
        procs.append(subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1800)
        if p.returncode != 0:
            raise RuntimeError(
                f"writer failed rc={p.returncode}: {err.decode()[-3000:]}"
            )
        outs.append(out)
    return outs


def _variant(root: str, tag: str, n: int, m: int, lease: bool) -> dict:
    work = os.path.join(root, tag, "base")
    mdir = os.path.join(root, tag, "markers")
    os.makedirs(mdir, exist_ok=True)
    setup = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--setup", work, mdir],
        capture_output=True, timeout=600,
    )
    if setup.returncode != 0:
        raise RuntimeError(setup.stderr.decode()[-3000:])
    _launch_writers(work, mdir, n, m, lease)
    res = [json.load(open(os.path.join(mdir, f"w{i}.res.json")))
           for i in range(n)]
    wall = max(r["t1"] for r in res) - min(r["t0"] for r in res)
    content, version = _content(work)
    return {
        "wall_sec": round(wall, 2),
        "version": version,
        "per_writer_merge_medians_sec": [
            sorted(r["per_merge_sec"])[len(r["per_merge_sec"]) // 2]
            for r in res
        ],
        "_content": content,
    }


def cmd_run(root: str, out_json: str, n: int, m: int) -> None:
    os.makedirs(root, exist_ok=True)

    sdir = os.path.join(root, "serial")
    smark = os.path.join(sdir, "markers")
    os.makedirs(smark, exist_ok=True)
    sbase = os.path.join(sdir, "base")
    sp = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--serial", sbase,
         smark, str(n), str(m)],
        capture_output=True, timeout=3600,
    )
    if sp.returncode != 0:
        raise RuntimeError(sp.stderr.decode()[-3000:])
    sres = json.load(open(os.path.join(smark, "serial.res.json")))
    s_content, s_version = _content(sbase)

    opt = _variant(root, "optimistic", n, m, lease=False)
    lea = _variant(root, "lease", n, m, lease=True)

    assert opt["_content"] == s_content, (
        "optimistic final content diverged from serial"
    )
    assert lea["_content"] == s_content, (
        "lease final content diverged from serial"
    )
    assert opt["version"] == lea["version"] == s_version == n * m, (
        "commit count mismatch",
        opt["version"], lea["version"], s_version, n * m,
    )
    opt.pop("_content")
    lea.pop("_content")

    wall_serial = round(sres["t1"] - sres["t0"], 2)
    out = {
        "n_writers": n,
        "rounds_per_writer": m,
        "commits_total": n * m,
        "n_buckets": N_BUCKETS,
        "wall_serial_sec": wall_serial,
        "optimistic": opt,
        "lease": lea,
        "speedup_optimistic_vs_lease": round(
            lea["wall_sec"] / opt["wall_sec"], 2
        ),
        "speedup_optimistic_vs_serial": round(
            wall_serial / opt["wall_sec"], 2
        ),
        "content_identical_all_variants": True,
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def main() -> int:
    mode = sys.argv[1]
    if mode == "--setup":
        cmd_setup(sys.argv[2], sys.argv[3])
    elif mode == "--writer":
        cmd_writer(
            sys.argv[2], sys.argv[3], int(sys.argv[4]), int(sys.argv[5]),
            int(sys.argv[6]), "--lease" in sys.argv[7:],
        )
    elif mode == "--serial":
        cmd_serial(sys.argv[2], sys.argv[3], int(sys.argv[4]),
                   int(sys.argv[5]))
    elif mode == "--run":
        n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
        m = int(sys.argv[5]) if len(sys.argv) > 5 else 6
        cmd_run(sys.argv[2], sys.argv[3], n, m)
    else:
        raise SystemExit(f"unknown mode {mode}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
