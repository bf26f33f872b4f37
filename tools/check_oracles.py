"""Local replica of the driver's correctness gate.

Runs every registered query at the given SF dir in Spark AND its DuckDB
oracle, compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, exact equality). Rows-only
queries are just executed and row-counted.

Usage: python tools/check_oracles.py [--hostile] [--twice] [sf_dir] [query ...]

--hostile: run under a driver-like SparkSession — ANSI on, non-UTC
  timezone, prime shuffle-partition count, none of get_spark()'s
  friendly confs. This is the probe that caught round 2's timezone and
  overflow failures; queries/_common.py::T() pins runtime confs and
  must keep every query green here.
--twice: execute each query twice in one session (catches
  order-dependence and cache-interaction bugs the driver's sweep
  would surface).
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from python_vectordbapp_ceph_spark.io import TABLES  # noqa: E402
from python_vectordbapp_ceph_spark.queries._compare import canon as df_rows  # noqa: E402
from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


class _Tee:
    """Mirror stdout into a file opened at ``path + '.partial'``;
    :meth:`finalize` renames it onto ``path`` — so a COMPLETE artifact
    (tally + entry lines present) is published atomically and a
    killed/overwritten run can only ever leave a ``.partial``, never
    silently truncate a previously complete sweep file (the r12
    closing-artifact failure: the end-of-round snapshot captured a
    re-running sweep mid-flight, 170 of 306 lines, no tally)."""

    def __init__(self, path: str):
        self.path = path
        self.partial = path + ".partial"
        self.f = open(self.partial, "w")
        self.stdout = sys.stdout

    def write(self, s):
        self.stdout.write(s)
        self.f.write(s)

    def flush(self):
        self.stdout.flush()
        self.f.flush()

    def finalize(self):
        sys.stdout = self.stdout
        self.f.close()
        os.replace(self.partial, self.path)


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    twice = "--twice" in args
    oracle_timeout = 1e9
    out_path = None
    for a in args:
        if a.startswith("--oracle-timeout="):
            oracle_timeout = float(a.split("=", 1)[1])
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
    args = [a for a in args if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    tee = None
    if out_path:
        tee = _Tee(out_path)
        sys.stdout = tee

    if hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("hostile-gate")
            .master("local[4]")
            .config("spark.sql.ansi.enabled", "true")
            .config(
                "spark.sql.session.timeZone",
                os.environ.get("SPARK_GRAFT_HOSTILE_TZ", "America/New_York"),
            )
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; Spark-written scale
        # points (tools/make_sf1.py) are directories of part files
        tp = f"{sf_dir}/{t}.parquet"
        pattern = f"{tp}/*.parquet" if os.path.isdir(tp) else tp
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_skip = 0
    from python_vectordbapp_ceph_spark.cache import release_caches

    import threading

    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        # engine-side watchdog (same rationale as the oracle one): the
        # exact-verify companions of the LSH tiers are quadratic by
        # design and belong at verification SF; at a big SF they'd
        # wedge the sweep. cancelAllJobs makes the collect raise.
        eng_done = threading.Event()
        eng_timed_out = []

        def _eng_watchdog():
            if not eng_done.wait(oracle_timeout):
                eng_timed_out.append(True)
                # cancelAllJobs only kills ACTIVE jobs — an iterative
                # query launches many; keep cancelling until it gives up
                while not eng_done.wait(2):
                    spark.sparkContext.cancelAllJobs()

        threading.Thread(target=_eng_watchdog, daemon=True).start()
        try:
            if twice:
                fn(spark, sf_dir).collect()
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = list(sdf.columns)
        except Exception:
            if eng_timed_out:
                print(f"SKIP {name}: engine exceeded {oracle_timeout}s at this SF", flush=True)
                n_skip += 1
            else:
                print(f"FAIL {name}: SPARK ERROR", flush=True)
                traceback.print_exc()
                n_fail += 1
            continue
        finally:
            eng_done.set()
            # a ~90-query sweep would otherwise accumulate every
            # operator's tracked persist for the whole session
            release_caches()
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)", flush=True)
            n_pass += 1
            continue
        try:
            # watchdog: an oracle that is super-linear at this SF
            # (recursive closures, all-pairs containment) gets
            # interrupted rather than wedging the whole sweep with a
            # runaway-memory DuckDB; the query is reported SKIP, not
            # FAIL — the engine side already ran, and the query's
            # exact gate lives at the SF its oracle can afford.
            import threading

            done = threading.Event()

            def _watchdog():
                if not done.wait(oracle_timeout):
                    # a single interrupt can be consumed before the
                    # engine reaches an interruptible point; repeat
                    # until the main thread confirms the raise
                    while not done.wait(2):
                        con.interrupt()

            w = threading.Thread(target=_watchdog, daemon=True)
            w.start()
            try:
                cur = con.execute(oracles[name])
                ocols = [d[0] for d in cur.description]
                orows = [tuple(r) for r in cur.fetchall()]
            finally:
                done.set()
        except duckdb.InterruptException:
            print(
                f"SKIP {name}: oracle exceeded {oracle_timeout}s at this SF "
                f"(engine side ran: {len(srows)} rows)"
            )
            n_skip += 1
            continue
        except Exception:
            print(f"FAIL {name}: DUCKDB ERROR", flush=True)
            traceback.print_exc()
            n_fail += 1
            continue
        sc, sr = df_rows(scols, srows)
        oc, orr = df_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: columns {sc} vs {oc}", flush=True)
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orr)}", flush=True)
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first: {bad[0][0]} vs {bad[0][1]}", flush=True)
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sr)} rows, {len(sc)} cols ({time.time()-t0:.1f}s)", flush=True)
        n_pass += 1

    skip_note = f" / {n_skip} oracle-timeout-skip" if n_skip else ""
    print(f"\n{n_pass} pass / {n_fail} fail{skip_note}")
    if not only:
        try:
            edf = entrymod.entry(spark)
            n = edf.count()
            print(f"entry(): {n} rows, schema {edf.columns}")
        except Exception:
            print("entry() FAILED")
            traceback.print_exc()
            n_fail += 1
    spark.stop()
    if tee is not None:
        # the artifact is complete (tally + entry lines written):
        # publish it by renaming the .partial onto the final name
        tee.finalize()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
