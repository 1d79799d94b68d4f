#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for every query in
outDir/oracle_sql.json, run the SQL in DuckDB over the sf parquet tables
and compare against the Spark-written parquet in outDir/<name>/.

Usage: check_oracle.py [sfDir] [outDir]
       check_oracle.py --one <name> <sfDir> <outDir>   (internal child)

Env (for bench-scale sweeps where single-threaded DuckDB would take
hours on the deliberately-quadratic small-scale oracle CTEs):
  CHECK_WORKERS     concurrent child processes (default 1 = in-process)
  CHECK_TIMEOUT_S   per-query budget; a child past it is killed and the
                    query recorded as TIMEOUT — a LOUD skip, counted in
                    the summary, never a silent pass (default: none)
  CHECK_DUCK_THREADS  SET threads per child connection (default 4)
"""
import datetime
import glob
import json
import os
import subprocess
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def _current_round(root):
    """The round being built = max(CORRECTNESS_r*.json present) + 1 —
    the driver writes round N's record at the N->N+1 boundary, so no
    maintained state is needed. 0 on any inference failure."""
    try:
        import re
        ns = [int(m.group(1)) for f in os.listdir(root)
              if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", f))]
        return (max(ns) + 1) if ns else 0
    except Exception:
        return 0


def gate_log(**fields):
    """Round-10 forensics (VERDICT r9 task #1): append one JSON line per
    gate invocation so the round record shows whether the driver ever
    RAN the gate even if its outputs are discarded. Rotated per round
    since r12 (the r11 unbounded-growth nit): lines land in
    gate_logs/GATE_LOG_r<N>.jsonl (same inference as Verify.gateLog;
    r1-r11 history preserved at gate_logs/GATE_LOG_r01_r11.jsonl, root
    GATE_LOG.jsonl is a pointer). Best-effort — never fails the gate."""
    try:
        root = next((p for p in ("/root/repo", ".")
                     if os.path.isdir(os.path.join(p, ".git"))), ".")
        # caller identity (round-10 verdict nit: driver/builder/judge
        # lines were indistinguishable). GATE_CALLER wins; else the
        # parent process's cmdline.
        try:
            with open(f"/proc/{os.getppid()}/cmdline", "rb") as cf:
                parent = cf.read().replace(b"\0", b" ").decode(
                    "utf-8", "replace").strip()[:200] or "?"
        except Exception:
            parent = "?"
        # schema note (r10 verdict nit, now load-bearing — the round-11
        # record was read back out of this log): Verify.gateLog writes
        # every value as a JSON string, so stringify here too and keep
        # the two tools' lines uniformly string-valued.
        rec = {"ts": datetime.datetime.now(datetime.timezone.utc)
               .isoformat(timespec="seconds"),
               "tool": "check_oracle.py",
               "caller": os.environ.get("GATE_CALLER", parent),
               "cwd": os.getcwd(),
               **{k: (v if isinstance(v, str) else
                      " ".join(map(str, v)) if isinstance(v, (list, tuple))
                      else str(v)) for k, v in fields.items()}}
        rec.update({f"env.{k}": v for k, v in sorted(os.environ.items())
                    if k.startswith(("SPARK_GRAFT_", "CHECK_"))})
        rnd = _current_round(root)
        if rnd > 0:
            os.makedirs(os.path.join(root, "gate_logs"), exist_ok=True)
            path = os.path.join(root, "gate_logs", f"GATE_LOG_r{rnd:02d}.jsonl")
        else:
            path = os.path.join(root, "GATE_LOG.jsonl")
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except Exception:
        pass

if len(sys.argv) > 1 and sys.argv[1] == "--one":
    _ONE, SF_DIR, OUT_DIR = sys.argv[2], sys.argv[3], sys.argv[4]
else:
    _ONE = None
    SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)


def dtype_err(a: pd.DataFrame, b: pd.DataFrame):
    """Driver-strictness dtype gate: the driver's typed-hash comparator
    distinguishes int64 from float64/object/HUGEINT, so a value-level
    pass with coerced dtypes (numpy ==) is NOT a driver pass. DuckDB
    widens integer sum() to HUGEINT (-> float64/object in fetchdf);
    flag any column whose dtype differs between the Spark parquet and
    the DuckDB result before comparing values."""
    errs = []
    for c in a.columns:
        ad, bd = a[c].dtype, b[c].dtype
        if ad == bd:
            continue
        # Nullable-int representation drift is not a driver signal:
        # pandas surfaces an int64 column containing nulls as float64
        # or object on EITHER side. Only flag when the non-null values
        # themselves disagree in kind.
        if a[c].isna().any() or b[c].isna().any():
            if {ad.kind, bd.kind} <= {"i", "f", "O"}:
                continue
        errs.append(f"{c}: spark={ad} oracle={bd}")
    if errs:
        return "dtype mismatch (driver hash would fail): " + "; ".join(errs)
    return None


def cmp(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    derr = dtype_err(a, b)
    if derr:
        return derr
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            eq = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            eq = pd.Series(av).eq(pd.Series(bv)) | (pd.Series(av).isna() & pd.Series(bv).isna())
            eq = eq.values
        if not eq.all():
            i = int(np.argmin(eq))
            return f"col {c} first mismatch at row {i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}"
    return None


def main():
    t_start = time.monotonic()
    gate_log(phase="start", args=sys.argv[1:], sf_dir=SF_DIR,
             out_dir=OUT_DIR)

    def finish(rc, **extra):
        gate_log(phase="done", rc=rc, args=sys.argv[1:],
                 wall_s=round(time.monotonic() - t_start, 1), **extra)
        sys.exit(rc)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    try:
        oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    except Exception as e:
        print(f"FATAL: cannot read {OUT_DIR}/oracle_sql.json ({e}) — "
              "the verify dump is absent or corrupt; this is an error, "
              "not a pass")
        finish(2, fatal="oracle_sql.json unreadable")
    # Fail-loud gates (round-8 postmortem: the official CORRECTNESS
    # record was `{}` and nothing noticed). An empty oracle map, or a
    # dump smaller than the registry the manifest says exists, is an
    # ERROR exit — never a vacuous 0-failure pass.
    if not oracle:
        print("FATAL: oracle_sql.json is EMPTY — the correctness gate "
              "recorded nothing; this is an error, not a pass")
        finish(2, fatal="oracle_sql.json empty")
    manifest = None
    try:
        manifest = json.load(open(f"{OUT_DIR}/manifest.json"))
    except Exception as e:
        print(f"WARN: no readable manifest.json ({e}) — completeness "
              "of the dump cannot be verified")
    if manifest is not None:
        nq, nsel = manifest.get("n_queries"), manifest.get("n_selected")
        nw, nf = manifest.get("n_written"), manifest.get("n_failed")
        print(f"manifest: registry={nq} selected={nsel} written={nw} "
              f"failed={nf} wall={manifest.get('wall_s')}s")
        if nsel == nq:  # full sweep claimed — hold it to the registry size
            if nw != nq or len(oracle) != nq:
                print(f"FATAL: incomplete full sweep — registry={nq} "
                      f"written={nw} oracle_entries={len(oracle)}")
                finish(2, fatal="incomplete full sweep",
                       registry=nq, written=nw)
        elif nsel is not None and nsel < (nq or 0):
            # dev-loop partial dump: compare only the selected queries
            # (oracle_sql.json always carries the full registry)
            present = {d.split("/")[-1] for d in glob.glob(f"{OUT_DIR}/*")
                       if "." not in d.split("/")[-1]}
            oracle = {k: v for k, v in oracle.items() if k in present}
            print(f"partial dump: checking {len(oracle)} present queries")
        if nf:
            print(f"FATAL: verify reported {nf} failed queries: "
                  f"{manifest.get('failed')}")
            # fall through to the per-query compare so the report still
            # shows which comparisons pass; exit is forced at the end
            # (their dump dirs are absent, so they also surface as
            # MISSING rows below — or as stale-dir mismatches if an
            # older dump is lying around, either way non-zero)
    n_ok = n_bad = 0
    verify_failed = bool(manifest and manifest.get("n_failed"))
    workers = int(os.environ.get("CHECK_WORKERS", "1"))
    timeout = os.environ.get("CHECK_TIMEOUT_S")
    timeouts = []
    if workers > 1 or timeout:
        lines = run_parallel(sorted(oracle), workers,
                             float(timeout) if timeout else None)
    else:
        lines = [check_one(con, oracle[name], name)
                 for name in sorted(oracle)]
    for line in lines:
        print(line)
        if line.startswith("ok"):
            n_ok += 1
        elif line.startswith("TIMEOUT"):
            timeouts.append(line.split()[1])
        else:
            n_bad += 1
    rows_only = [d.split("/")[-1] for d in sorted(glob.glob(f"{OUT_DIR}/*"))
                 if "." not in d.split("/")[-1] and d.split("/")[-1] not in oracle]
    print(f"\n{n_ok} ok, {n_bad} failing, {len(timeouts)} oracle-timeout; "
          f"rows-only (no oracle): {rows_only}")
    if timeouts:
        # a timeout is a LOUD unchecked query, not a pass and not an
        # engine failure: the oracle SQL (deliberately quadratic at
        # small scale) outgrew the per-query budget at this corpus size
        print(f"oracle-timeouts (> {timeout}s in DuckDB, unchecked at "
              f"this scale): {timeouts}")
    finish(1 if (n_bad or verify_failed) else 0,
           n_ok=n_ok, n_bad=n_bad, n_timeout=len(timeouts),
           n_rows_only=len(rows_only))


def check_one(con, sql, name):
    """One query's compare; returns the report line."""
    files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
    if not files:
        return f"MISSING  {name}: no spark output"
    try:
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        duck_df = norm(con.execute(sql).fetchdf())
    except Exception as e:
        return f"ERROR    {name}: {str(e)[:160]}"
    err = cmp(spark_df, duck_df)
    if err:
        return f"MISMATCH {name}: {err}"
    return f"ok       {name} ({len(spark_df)} rows)"


def child_main():
    """--one <name> <sf> <out>: run a single compare in this process."""
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('CHECK_DUCK_THREADS', '4')}")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    print(check_one(con, oracle[_ONE], _ONE))


def run_parallel(names, workers, timeout):
    """Dispatch each query as a --one child with a kill-on-timeout."""
    pending = list(names)
    running = {}  # name -> Popen
    results = {}
    import time
    deadline = {}
    while pending or running:
        while pending and len(running) < workers:
            n = pending.pop(0)
            running[n] = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--one", n, SF_DIR, OUT_DIR],
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                text=True)
            deadline[n] = (time.monotonic() + timeout) if timeout else None
        time.sleep(0.2)
        for n, p in list(running.items()):
            rc = p.poll()
            if rc is not None:
                out = (p.stdout.read() or "").strip()
                results[n] = out if out else f"ERROR    {n}: child rc={rc}"
                del running[n]
            elif deadline[n] is not None and time.monotonic() > deadline[n]:
                p.kill()
                p.wait()
                results[n] = f"TIMEOUT  {n}: oracle exceeded {timeout}s"
                del running[n]
    return [results[n] for n in names]


if __name__ == "__main__":
    if _ONE is not None:
        child_main()
    else:
        main()
