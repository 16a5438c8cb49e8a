#!/usr/bin/env python3
"""Regenerates LEAKCHECK.json (same seven categories as the committed
round artifacts) with a git_sha stamp, so the round-close regen is a
checked artifact like every BENCH_/PLANS_ file instead of an ad-hoc
grep whose provenance stampcheck cannot see.

Scans src/, build.sbt, project/, tools/ for references that must never
appear in this repo: non-public package imports, internal hosts/URLs,
cloud bucket URIs, slack links, credential-shaped strings, and
internal-environment variable names. Zero hits is the only passing
state; any hit prints and exits nonzero.

Usage: python3 tools/leakcheck.py [round_number]
"""
import json, os, re, subprocess, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Scala/sbt import lines whose root package is not on the public
# allowlist. graft is this repo; everything else must be JDK/Scala/
# Spark/test ecosystem.
PUBLIC_ROOTS = (
    "java", "javax", "scala", "org.apache", "org.scalatest",
    "org.scalacheck", "org.slf4j", "org.xml", "org.w3c", "com.fasterxml",
    "org.json4s", "graft",
    # local-val implicit imports (`import spark.implicits._`) are not
    # package references at all
    "spark.implicits", "s.implicits",
)

CATEGORIES = {
    "internal-import": re.compile(r"^\s*import\s+(?!(" + "|".join(
        re.escape(p) for p in PUBLIC_ROOTS) + r")\b)[a-z]"),
    "internal-url": re.compile(
        r"https?://[\w.-]*(corp|internal|intranet)[\w.-]*"),
    "internal-pkg2": re.compile(
        r"\b(anthropic|claude)[\w.]*\s*[.(]", re.IGNORECASE),
    "internal-bucket": re.compile(r"\b(s3|gs|s3a|s3n)://[\w.-]+"),
    "slack-link": re.compile(r"slack\.com/archives|\bgo/[a-z][\w-]{2,}\b"),
    "api-key": re.compile(r"\b(AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|xox[bpas]-)"),
    "axon-env": re.compile(r"\b[A-Z]+_(INTERNAL|CORP|SECRET)_[A-Z_]+\b"),
}

SCAN = ["src", "build.sbt", "project", "tools"]


def files():
    out = subprocess.run(["git", "ls-files"] + SCAN, capture_output=True,
                         text=True, check=True, cwd=ROOT).stdout.split()
    return [f for f in out if not f.endswith((".parquet", ".png", ".bin"))]


def main():
    # the round number is REQUIRED: the r11 close regenerated this
    # artifact without it and committed "round": 0 (ADVICE r11) — fail
    # loudly instead of silently stamping a wrong round
    if len(sys.argv) < 2:
        sys.exit("usage: python3 tools/leakcheck.py <round_number>")
    rnd = int(sys.argv[1])
    hits = {k: [] for k in CATEGORIES}
    for f in files():
        if f == "tools/leakcheck.py":
            continue  # the patterns themselves are not leaks
        try:
            text = open(os.path.join(ROOT, f), encoding="utf-8",
                        errors="replace").read()
        except OSError:
            continue
        scala = f.endswith((".scala", ".sbt"))
        for i, line in enumerate(text.splitlines(), 1):
            for cat, rx in CATEGORIES.items():
                # the import pattern is a Scala/sbt package check;
                # python stdlib imports in tools/ are not packages
                if cat == "internal-import" and not scala:
                    continue
                if rx.search(line):
                    hits[cat].append(f"{f}:{i}: {line.strip()[:160]}")
    n = sum(len(v) for v in hits.values())
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True, check=True, cwd=ROOT).stdout.strip()
    dirty = subprocess.run(
        ["git", "status", "--porcelain", "--"] + SCAN,
        capture_output=True, text=True, check=True, cwd=ROOT).stdout.strip()
    sha = head + ("-dirty" if dirty else "")
    doc = {"round": rnd, "n_hits": n, "hits": hits, "git_sha": sha}
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as fh:
        json.dump(doc, fh, indent=2)
        fh.write("\n")
    print(f"LEAKCHECK: {n} hit(s), stamped {sha[:12]}")
    if n:
        for cat, v in hits.items():
            for h in v:
                print(f"  [{cat}] {h}")
        sys.exit(1)


if __name__ == "__main__":
    main()
