"""N-writer optimistic scaling twin (tools/optimistic_scaling.py) —
the r14 follow-on to the two-process correctness twin: THREE OS
processes merge disjoint bucket sets concurrently with no lease, and
every commit lands (version count = N*M), every commit's recorded
touched set is disjoint from every other writer's, and the final
content equals the serial expectation (disjoint writers commute)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import pytest

TWIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "optimistic_scaling.py",
)

N, M = 3, 2


def _content_duck(path):
    import duckdb

    commits = sorted(
        n for n in os.listdir(os.path.join(path, "_commits"))
        if n.startswith("v") and n.endswith(".json")
    )
    man = json.load(open(os.path.join(path, "_commits", commits[-1])))
    parts = [
        os.path.join(path, f"gen={g}", f"_kb={b}", "*.parquet")
        for b, g in man["buckets"].items()
    ]
    rows = duckdb.connect().execute(
        "SELECT key, val FROM read_parquet(?)", [parts]
    ).fetchall()
    return {k: v for k, v in rows}, int(man["version"])


@pytest.mark.slow
def test_three_process_disjoint_writers_all_land(tmp_path):
    base = str(tmp_path / "base")
    mdir = str(tmp_path / "markers")
    os.makedirs(mdir)

    setup = subprocess.run(
        [sys.executable, TWIN, "--setup", base, mdir],
        capture_output=True, timeout=600,
    )
    assert setup.returncode == 0, setup.stderr.decode()[-2000:]

    procs = [
        subprocess.Popen(
            [sys.executable, TWIN, "--writer", base, mdir,
             str(i), str(N), str(M)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(N)
    ]
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, (err or out).decode()[-2000:]

    content, version = _content_duck(base)
    assert version == N * M, f"expected {N * M} commits, manifest at v{version}"

    # every commit's touched set disjoint from every OTHER writer's
    # commits (same-writer commits legitimately touch the same buckets)
    keymap = json.load(open(os.path.join(mdir, "keymap.json")))
    sys.path.insert(0, os.path.dirname(os.path.dirname(TWIN)))
    from tools.optimistic_scaling import _writer_keys  # noqa: E402

    owner_buckets = [
        {keymap[k] for k in _writer_keys(keymap, N, i)} for i in range(N)
    ]
    for v in range(1, N * M + 1):
        touched = set(json.load(open(
            os.path.join(base, "_commits", f"v{v:012d}.json")
        ))["touched"])
        owners = [i for i in range(N) if touched <= owner_buckets[i]]
        assert len(owners) == 1, (v, touched, owner_buckets)

    # content = serial expectation: writer i's keys end at round M-1
    expected = {f"k{i}": i for i in range(512)}
    for i in range(N):
        for k in _writer_keys(keymap, N, i):
            expected[k] = (i + 1) * 1000 + (M - 1)
    assert content == expected
