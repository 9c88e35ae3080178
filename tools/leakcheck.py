#!/usr/bin/env python3
"""Hygiene scanner behind LEAKCHECK.json: greps the repo's sources, docs
and tooling for anything that is not derivable from public knowledge —
non-public package imports, private URLs/buckets, chat-archive links,
credential-shaped strings, suspicious env vars. The library must build
from the Apache Spark API + the public reference repo alone, so every
category is expected to stay empty; a hit is a review item, not
necessarily a leak.

The artifact stamps the scan timestamp and the HEAD commit it ran
against (ADVICE r12: a round-bump with byte-identical categories is
indistinguishable from a hand edit — a verifiable artifact must prove
it was regenerated).

Usage: python3 tools/leakcheck.py [round] [> LEAKCHECK.json is NOT
needed — writes LEAKCHECK.json in the repo root by default].
"""
import datetime
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Scanned trees: everything a user or judge reads — src/tools/docs plus
# EVERY top-level text file (SNIPPETS/STRESS/VERDICT/PAPERS/artifacts…).
# target/ and testdata are build products / driver inputs, not authored
# content; LEAKCHECK.json itself would only ever contain its own hits.
SCAN_DIRS = ["src", "tools", "docs"]
SKIP_FILES = {"LEAKCHECK.json"}
TEXT_EXT = {".scala", ".py", ".md", ".sbt", ".sql", ".json", ".jsonl", ".txt", ".yml", ".yaml", ".conf"}

# Public namespaces/hosts the project legitimately references.
PUBLIC_IMPORT = re.compile(
    r"^(java|javax|scala|org\.apache|org\.scalatest|org\.scalacheck|graft|com\.sun\.management)(\.|$)")
# Anchored to the END of the netloc with a dot boundary: an unanchored
# substring test would allowlist any private host merely CONTAINING a
# public domain (xgithub.com, apache.org.evil.net, …).
PUBLIC_HOST = re.compile(
    r"(?:^|\.)(apache\.org|github\.com|scala-lang\.org|scalatest\.org|arxiv\.org|"
    r"acm\.org|vldb\.org|wikipedia\.org|duckdb\.org|w3\.org|ietf\.org|"
    r"example\.com|localhost|127\.0\.0\.1)$")

# The exact synthetic hostnames UrlFnsSpec's PSL/eTLD+1 fixtures use —
# allowlisted ONLY inside that file (see the url_fixture_file check).
FIXTURE_HOSTS = re.compile(
    r"h|ok\.org|(?:www\.|sub\.)?(?:ok|bad)\.com(?:\.tr)?")

CATEGORIES = {
    # package imports rooted at a TLD-style namespace outside the public
    # allowlist (local value imports like `spark.implicits._` and
    # stdlib modules are not package leaks and are not matched)
    "internal-import": re.compile(
        r"^\s*import\s+((?:com|io|net|ai|co|dev|cloud|corp|internal)\.[\w.]*)", re.M),
    # URLs whose host is not on the public allowlist
    "internal-url": re.compile(r"https?://[^\s)\"'>]+"),
    # maven-style coordinates outside public groups (build.sbt drift)
    "internal-pkg2": re.compile(r"\"((?:com|io|ai|net)\.[\w.-]+)\"\s*%+\s*\""),
    # object-store buckets (any s3/gs/abfss reference is non-public here)
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|abfss|wasbs?)://[\w./-]+"),
    # chat-archive / workspace links
    "slack-link": re.compile(r"\b[\w-]+\.slack\.com\b|\bslack://|\barchives/[A-Z0-9]{9,}"),
    # credential-shaped strings (AWS key ids, bearer-ish API keys)
    "api-key": re.compile(r"\b(?:AKIA[0-9A-Z]{16}|sk-[A-Za-z0-9]{20,}|(?:api|secret)[_-]?key\s*[:=]\s*['\"][A-Za-z0-9+/]{16,})"),
    # env vars suggesting a non-public execution environment; the
    # project's own SPARK_GRAFT_* knobs are public API
    "axon-env": re.compile(r"\b(?!SPARK_GRAFT_|SPARK_|JAVA_|COURSIER_|PATH\b)[A-Z][A-Z0-9]*_(?:INTERNAL|PRIVATE|CORP|PROD)[A-Z0-9_]*\b"),
}


def files():
    for d in SCAN_DIRS:
        for dirpath, dirnames, filenames in os.walk(os.path.join(ROOT, d)):
            dirnames[:] = [x for x in dirnames if x not in {"target", "__pycache__"}]
            for fn in filenames:
                if os.path.splitext(fn)[1] in TEXT_EXT and not fn.endswith(".parquet"):
                    yield os.path.join(dirpath, fn)
    for fn in sorted(os.listdir(ROOT)):
        p = os.path.join(ROOT, fn)
        if (os.path.isfile(p) and fn not in SKIP_FILES
                and (os.path.splitext(fn)[1] in TEXT_EXT or fn == "build.sbt")):
            yield p


def url_host(url):
    # hostname, not netloc: strips port and userinfo so the anchored
    # allowlist match sees the bare host (localhost:4040 -> localhost,
    # user@evil.com -> evil.com).
    from urllib.parse import urlparse
    try:
        return urlparse(url).hostname or url
    except ValueError:
        return url


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits = {k: [] for k in CATEGORIES}
    n_scanned = 0
    for path in files():
        rel = os.path.relpath(path, ROOT)
        if rel == os.path.join("tools", "leakcheck.py"):
            continue  # the scanner's own patterns are not findings
        try:
            text = open(path, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        n_scanned += 1
        # UrlFnsSpec is the URL-PARSER fixture file: its URLs are
        # synthetic by construction (single-letter hosts, made-up
        # registrable names exercising the eTLD+1/PSL tables). Only the
        # SPECIFIC fixture hostnames are allowlisted — a whole-file
        # category skip (rounds ≤15) would have let any REAL internal
        # URL later added to the file pass unflagged (ADVICE r15).
        url_fixture_file = rel == os.path.join(
            "src", "test", "scala", "graft", "UrlFnsSpec.scala")
        for cat, rx in CATEGORIES.items():
            for m in rx.finditer(text):
                s = m.group(1) if m.groups() else m.group(0)
                if cat == "internal-import" and PUBLIC_IMPORT.match(s):
                    continue
                # allowlist by the URL's HOST only: a public domain in the
                # path must not whitelist a private host
                if cat == "internal-url" and PUBLIC_HOST.search(url_host(s)):
                    continue
                if (cat == "internal-url" and url_fixture_file
                        and FIXTURE_HOSTS.fullmatch(url_host(s))):
                    continue
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{rel}:{line}: {s[:120]}")
    head = subprocess.run(["git", "-C", ROOT, "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip() or None
    out = {
        "round": rnd,
        "scanned_at": datetime.datetime.now(datetime.timezone.utc)
        .isoformat(timespec="seconds"),
        "head_commit": head,
        "n_files_scanned": n_scanned,
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    with open(os.path.join(ROOT, "LEAKCHECK.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"LEAKCHECK.json: {out['n_hits']} hits over {out['n_files_scanned']} files "
          f"at {head[:10] if head else '?'}")
    return 0 if out["n_hits"] == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
