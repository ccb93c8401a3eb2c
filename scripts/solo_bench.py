#!/usr/bin/env python3
"""Per-query SOLO benchmark: one fresh JVM per query (the full-suite
bench carries 2-4x context noise between queries; VERDICT r9 #7 asks
for a solo-vs-solo baseline so future rounds can flag TRUE regressions).

Runs graft.Bench with SPARK_GRAFT_ONLY=<name> per query and merges the
per-run detail files into BENCH_SOLO.json (slowest first), alongside
BENCH_DETAIL.json.

Usage: python3 scripts/solo_bench.py [sf_dir] [out_json] [name ...]
Defaults: /root/testdata/sf0.1  BENCH_SOLO.json  all queries.
Invokes java directly on the sbt-compiled classes (run `sbt compile`
first) with the same module options build.sbt passes to forked runs.
"""
import json, os, subprocess, sys, glob, tempfile

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_SOLO.json"
only = sys.argv[3:]

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]
cp = "target/scala-2.13/classes:" + ":".join(sorted(glob.glob("/opt/spark/jars/*.jar")))
base_cmd = ["java"]
for p in ADD_OPENS:
    base_cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
base_cmd += ["-Xmx8g", "-Dspark.ui.enabled=false",
             "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench"]

def run_one(name):
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        detail = f.name
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_ONLY=name, SPARK_GRAFT_DETAIL=detail)
    r = subprocess.run(base_cmd, env=env, capture_output=True, text=True)
    try:
        try:
            ms = json.load(open(detail))["queries_ms"].get(name, -1.0)
        except Exception as e:
            return -1.0, f"{e}: {r.stdout[-200:]} {r.stderr[-200:]}"
        # Bench records a failing query as -1 AND exits non-zero; a clean
        # baseline must not round-trip either as a timing
        if r.returncode != 0 or ms < 0:
            return -1.0, (f"bench rc={r.returncode} ms={ms}: "
                          f"{r.stdout[-200:]} {r.stderr[-200:]}")
        return ms, None
    finally:
        try:
            os.unlink(detail)
        except OSError:
            pass

if only:
    names = only
else:
    # enumerate from the committed full-bench detail
    if not os.path.exists("BENCH_DETAIL.json"):
        print("no BENCH_DETAIL.json to enumerate queries from", file=sys.stderr)
        sys.exit(2)
    names = sorted(json.load(open("BENCH_DETAIL.json"))["queries_ms"])

# across-JVM variance is the dominant noise source (a cold JIT can cost
# 2x); SOLO_RUNS>1 takes the min over that many fresh JVMs per query
runs = max(1, int(os.environ.get("SOLO_RUNS", "1")))
res, errs, flaky = {}, {}, {}
for i, n in enumerate(names):
    best, err = None, None
    for _ in range(runs):
        ms, e = run_one(n)
        if e:
            err = e
        elif best is None or ms < best:
            best = ms
    res[n] = -1.0 if best is None else best
    if err:
        # every failure counts: a run that failed while another
        # succeeded is a FLAKY query (recorded, exit stays 0); all runs
        # failing is an error (exit 1)
        (errs if best is None else flaky)[n] = err
    print(f"[{i+1}/{len(names)}] {n}: {res[n]:.1f} ms" +
          (f" ERR {err}" if best is None and err else "") +
          (f" FLAKY {err}" if best is not None and err else ""), flush=True)

sf_name = [p for p in sf_dir.split("/") if p][-1]
# A name-subset run MERGES into the existing dump (same sf only) —
# clobbering the other ~140 baselines would silently disable Bench's
# de-contention ordering and stall detection for every other query.
notes = {}
if only and os.path.exists(out_json):
    try:
        prev = json.load(open(out_json))
        if prev.get("sf") == sf_name:
            res = {**prev.get("queries_ms", {}), **res}
            # carry round-note annotations through subset merges
            notes = {k: v for k, v in prev.items() if k.startswith("notes")}
    except Exception:
        pass
body = {
    "sf": sf_name, "unit": "ms",
    "mode": f"solo (one JVM per query, min over {runs} run(s))",
    "queries_ms": dict(sorted(res.items(), key=lambda kv: -kv[1])),
    **notes,
}
if errs:
    body["errors"] = errs
if flaky:
    body["flaky"] = flaky
json.dump(body, open(out_json, "w"), indent=1)
print(f"wrote {out_json}: {len(res)} queries, "
      f"{len(errs)} errors, {len(flaky)} flaky")
sys.exit(1 if errs else 0)
