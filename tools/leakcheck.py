#!/usr/bin/env python3
"""Repo-owned leak check with run provenance.

Scans the tracked source tree for strings that must never appear in a
public, from-public-knowledge codebase: proprietary/internal package
imports, internal URLs or shortlinks, cloud bucket URIs, credential-shaped
tokens, and internal environment variables. Mirrors the driver's LEAKCHECK
categories, but — unlike the driver artifact, which carries only a round
number — stamps each run with the commit it scanned and a digest of the
exact bytes scanned (ADVICE r7: an artifact that changes only its round
field cannot prove a fresh run).

Usage: python3 tools/leakcheck.py [outfile]   (default LEAKCHECK_local.json)
Exit 0 when clean, 1 when any category hits.
"""
import hashlib, json, re, subprocess, sys, time

CATEGORIES = {
    # internal/proprietary package roots (public Spark/Scala/Java are fine)
    "internal-import": r"^\s*import\s+(?:com|net|io)\.(?:anthropic|internal|corp|proprietary)\b",
    # internal hosts and shortlinks
    "internal-url": r"\b(?:go|slack|corp|intranet)/[A-Za-z0-9_-]{2,}\b|\.internal\b|\.corp\b",
    # cloud bucket URIs (the engine is local-FS only; any bucket is a leak)
    "internal-bucket": r"\b(?:s3a?|gs|abfss?)://[A-Za-z0-9._-]+",
    # slack archives / channel links
    "slack-link": r"slack\.com/archives|#[a-z0-9-]*claude[a-z0-9-]*",
    # credential-shaped strings
    "api-key": r"\b(?:sk|pk|key|token)-[A-Za-z0-9]{20,}\b|AKIA[0-9A-Z]{16}",
    # environment variables not of this project's public namespace
    "internal-env": r"\bsys\.env\([\"'](?!SPARK_GRAFT_|COURSIER_)[A-Z][A-Z0-9_]{3,}[\"']\)",
}


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "LEAKCHECK_local.json"
    # Code + top-level docs about THIS engine. SURVEY.md is excluded on
    # purpose: it documents the reference's published bucket layout
    # (legitimate provenance citations that a bucket-URI pattern would flag).
    files = subprocess.run(
        ["git", "ls-files", "src", "tools", "README.md", "build.sbt"],
        capture_output=True, text=True, check=True).stdout.split()
    digest = hashlib.sha256()
    hits = {k: [] for k in CATEGORIES}
    for path in sorted(files):
        try:
            data = open(path, "rb").read()
        except OSError:
            continue
        digest.update(path.encode() + b"\0" + data)
        text = data.decode("utf-8", errors="replace")
        if path == "tools/leakcheck.py":
            continue  # hashed above; its CATEGORIES table self-matches
        for i, line in enumerate(text.splitlines(), 1):
            for cat, pat in CATEGORIES.items():
                if re.search(pat, line):
                    hits[cat].append(f"{path}:{i}: {line.strip()[:120]}")
    head = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                          text=True).stdout.strip()
    n = sum(len(v) for v in hits.values())
    artifact = {
        "ran_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "files_scanned": len(files),
        "input_sha256": digest.hexdigest(),
        "n_hits": n,
        "hits": {k: v for k, v in hits.items() if v} or {k: [] for k in hits},
    }
    json.dump(artifact, open(out, "w"), indent=2)
    print(f"[leakcheck] {len(files)} files, {n} hits -> {out}")
    sys.exit(1 if n else 0)


if __name__ == "__main__":
    main()
