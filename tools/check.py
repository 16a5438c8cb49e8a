#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sf_dir] [out_dir]

Assumes `graft.Verify` already wrote <out_dir>/<name>/ parquet dirs and
<out_dir>/oracle_sql.json. Registers each testdata parquet as a DuckDB
view, runs every oracle, and compares (columns sorted by name, rows
sorted, values stringified) against the Spark output.
"""
import os, subprocess, sys, json, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

# Subprocess pool (round-9, after the round-8 flake class reproduced
# locally): a single process running ~190 oracles accretes allocator/
# map state until even 2 KB DuckDB allocations fail — with 120 GB
# free. Parent mode slices the sorted query list into chunks and runs
# each chunk in a PRISTINE child process (this same file with
# --chunk); children do the actual compare work below.
CHUNK = 20
# the historically-heaviest oracles run ALONE in their child so any
# RSS spike lands in a pristine address space. After the round-9
# band-signature restructure (bandSigSql: one row per (vec, band))
# every one of these peaks under 700 MB — q182 measured 5.3 GB before,
# 185 MB after — but the isolation stays: it costs ~1 s per query and
# protects the gate if a corpus grows
HEAVY = {"q182_real_vec_neardup", "q183_real_vec_semdedup",
         "q176_real_set_sim", "q121_neardup_hightau", "q44_embed_neardup",
         "q108_mmr_rerank"}
chunk_names = None
if "--chunk" in sys.argv:
    chunk_names = set(sys.argv[sys.argv.index("--chunk") + 1].split(","))
# heavy singletons get a roomier buffer pool (they own the process);
# light chunks stay tight so 20 queries never accrete a big pool
mem_limit = sys.argv[sys.argv.index("--mem") + 1] if "--mem" in sys.argv else "4GB"

if chunk_names is None:
    all_names = sorted(json.load(open(f"{out}/oracle_sql.json")))
    light = [n for n in all_names if n not in HEAVY]
    chunks = [light[i:i + CHUNK] for i in range(0, len(light), CHUNK)] + \
        [[n] for n in all_names if n in HEAVY]
    names = all_names
    fails = 0
    for chunk in chunks:
        mem = "8GB" if chunk[0] in HEAVY else "4GB"
        # the sandbox's lazily-backed memory makes fast multi-GB RSS
        # ramps fail malloc nondeterministically (~4 KB blocks refused
        # with 120 GB "free") — an environmental flake, so a failed
        # child gets fresh-process retries before counting as FAIL
        for attempt in range(3):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), sf, out,
                 "--chunk", ",".join(chunk), "--mem", mem],
                capture_output=True, text=True)
            if r.returncode in (0, 3):
                # 0 = clean; 3 = DETERMINISTIC compare failure — a real
                # mismatch reproduces identically, so retrying it three
                # times only delays the verdict (observed on q196's
                # first cut: 3 full runs before the FAIL surfaced)
                break
            import time
            print(f"WARN chunk {chunk[0]}..: child attempt {attempt + 1} failed, retrying")
            time.sleep(5 * (attempt + 1))
        sys.stdout.write(r.stdout)
        if r.returncode != 0:
            # a crashed child (not just FAIL lines) must surface too
            failed_lines = r.stdout.count("FAIL ")
            if failed_lines == 0:
                print(f"FAIL chunk {chunk[0]}..{chunk[-1]}: child crashed: "
                      f"{r.stderr.strip().splitlines()[-1] if r.stderr.strip() else 'no stderr'}")
                fails += len(chunk)
            else:
                fails += failed_lines
    print(f"\n{len(names) - fails}/{len(names)} pass")
    sys.exit(1 if fails else 0)

def fresh_con(retries=5):
    # connecting right after a big JVM teardown can transiently fail
    # allocation (the round-8 environmental flake) — back off and retry
    import time
    for attempt in range(retries):
        try:
            c = duckdb.connect()
            # modest limits: the default (80% of host RAM) makes DuckDB
            # allocate greedily, which trips the sandbox's transient
            # post-JVM allocation failures; 6 GB + spill covers every
            # oracle here (heaviest measured ~26 s banding replay)
            c.execute(f"SET memory_limit='{mem_limit}'")
            # heavy singletons ramp allocation slower on fewer threads
            # (the sandbox's lazily-backed memory punishes fast ramps)
            c.execute(f"SET threads={8 if mem_limit == '8GB' else 16}")
            c.execute("SET temp_directory='/tmp/duckdb_check_spill'")
            for p in glob.glob(f"{sf}/*.parquet"):
                name = p.split("/")[-1].replace(".parquet", "")
                c.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
            return c
        except Exception as e:
            if attempt == retries - 1:
                raise
            print(f"WARN: duckdb connect/view setup failed (attempt {attempt + 1}): {e}")
            time.sleep(5 * (attempt + 1))

# Within a child: still recycle the connection periodically and retry
# a failed oracle once on a fresh connection (transient bad_alloc
# right after a big JVM teardown is environmental).
RECYCLE_EVERY = 10
con = fresh_con()

oracles = {k: v for k, v in json.load(open(f"{out}/oracle_sql.json")).items()
           if k in chunk_names}

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return repr(v)
        return str(v)
    return df.map(cell)

fails = 0
env_fails = 0  # oracle-side errors (possibly environmental): parent may retry
for qi, (name, sql) in enumerate(sorted(oracles.items())):
    if qi and qi % RECYCLE_EVERY == 0:
        con.close()
        con = fresh_con()
    # Deterministic SQL errors (a typo in a newly added oracle) must
    # NOT take the environmental-retry path: rc 1 triggers the
    # parent's 3 fresh-process retries with backoff — minutes of
    # sleeps for a failure retrying cannot fix (round-9 advice).
    def deterministic(e):
        return isinstance(e, (duckdb.ParserException, duckdb.BinderException,
                              duckdb.CatalogException, duckdb.SyntaxException))
    try:
        want = con.execute(sql).df()
    except Exception as e:
        if deterministic(e):
            print(f"FAIL {name}: oracle SQL error (deterministic, no retry): {e}")
            fails += 1
            continue
        try:
            con.close()
        except Exception:
            pass
        con = fresh_con()
        try:
            want = con.execute(sql).df()
            print(f"WARN {name}: oracle retried on a fresh connection after: {e}")
        except Exception as e2:
            if deterministic(e2):
                print(f"FAIL {name}: oracle SQL error (deterministic, no retry): {e2}")
                fails += 1
                continue
            print(f"FAIL {name}: oracle error: {e2}")
            fails += 1
            env_fails += 1
            continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{out}/{name}/*.parquet"))])
    except Exception as e:
        # possibly the same transient-allocation flake as the oracle
        # path (parquet read allocates buffers too) — classify as
        # environmental so the parent's fresh-process retry applies
        print(f"FAIL {name}: spark output missing: {e}")
        fails += 1
        env_fails += 1
        continue
    w, g = norm(want), norm(got)
    if list(w.columns) != list(g.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs oracle {list(w.columns)}")
        fails += 1
        continue
    w2 = w.sort_values(by=list(w.columns)).reset_index(drop=True)
    g2 = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    if len(w2) != len(g2):
        print(f"FAIL {name}: rows {len(g2)} vs oracle {len(w2)}")
        fails += 1
        continue
    if not w2.equals(g2):
        diff = (w2 != g2).any(axis=1)
        idx = diff[diff].index[:3]
        print(f"FAIL {name}: value mismatch at rows {list(idx)}")
        for i in idx:
            print(f"  oracle: {w2.loc[i].to_dict()}")
            print(f"  spark : {g2.loc[i].to_dict()}")
        fails += 1
        continue
    print(f"PASS {name} ({len(g2)} rows)")

print(f"\n{len(oracles) - fails}/{len(oracles)} pass")
# rc 1 = at least one environmental failure (oracle error / parquet
# read): parent retries in a fresh process — deterministic mismatches
# in the same chunk simply reproduce there. rc 3 = ONLY deterministic
# mismatches: never retried.
sys.exit(0 if not fails else (1 if env_fails > 0 else 3))
