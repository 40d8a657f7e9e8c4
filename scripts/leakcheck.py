"""Regenerate LEAKCHECK.json from an actual sweep of the working tree.

Earlier rounds hand-refreshed the artifact's ``round`` field, which made
its provenance unverifiable (ADVICE r8). This script IS the sweep: it
scans every tracked text file for the seven leak categories and writes
the artifact with a run timestamp + git head so staleness is detectable.

Usage: python scripts/leakcheck.py [ROUND_NUMBER]
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: packages legitimately importable in this environment (baked-in public
#: wheels + stdlib — stdlib is matched separately below)
PUBLIC_PKGS = {
    "pyspark", "pandas", "numpy", "pyarrow", "duckdb", "pytest",
    "hypothesis", "py4j", "cql_xmlpipe_spark", "tests", "scripts",
    "bench", "__spark_entry__",
}

#: public hosts that may appear in docs/docstrings
PUBLIC_HOST_RE = re.compile(
    r"(github\.com|example\.com|apache\.org|wikipedia\.org|python\.org|"
    r"w3\.org|sphinxsearch\.com|datastax\.com|cassandra\.apache\.org|"
    r"arxiv\.org|acm\.org|ieee\.org|openjdk\.org|duckdb\.org|"
    r"localhost|127\.0\.0\.1)"
)

#: env vars this repo legitimately reads
PUBLIC_ENV_RE = re.compile(
    r"^(SPARK_|PYSPARK|JAVA_|PATH$|HOME$|TZ$|TMPDIR$|USER$|PYTHON|ARROW_)"
)

URL_RE = re.compile(r"https?://[\w.-]+")
BUCKET_RE = re.compile(r"\b(?:s3a?|gs|wasbs?|abfss?)://[\w.-]+")
SLACK_RE = re.compile(r"(slack\.com|\bgo/[a-z][\w-]{2,})")
KEY_RE = re.compile(
    r"(\bAKIA[0-9A-Z]{16}\b|\bsk-[A-Za-z0-9]{20,}\b|"
    r"\b(?:api|secret)[_-]?key\s*=\s*['\"][A-Za-z0-9+/]{16,}['\"])",
    re.IGNORECASE,
)
IMPORT_RE = re.compile(r"^\s*(?:from\s+([\w.]+)\s+import|import\s+([\w.]+))", re.M)
ENV_RE = re.compile(r"os\.environ(?:\.get)?[\[(]\s*['\"]([A-Z0-9_]+)['\"]")


_STDLIB = set(getattr(sys, "stdlib_module_names", ())) | {"__future__"}


def tracked_files() -> list[str]:
    # -z / NUL-split: whitespace-splitting would shatter any tracked
    # filename containing a space into bogus paths that silently fail
    # open() and escape the sweep (ADVICE r9)
    out = subprocess.run(
        ["git", "ls-files", "-z"], cwd=REPO, capture_output=True, text=True,
        check=True,
    ).stdout.split("\0")
    keep = []
    for f in out:
        if not f:
            continue
        if f.endswith((".parquet", ".png", ".bmp", ".bin")):
            continue
        keep.append(f)
    return keep


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else None
    hits: dict[str, list[str]] = {
        k: []
        for k in (
            "internal-import", "internal-url", "internal-pkg2",
            "internal-bucket", "slack-link", "api-key", "axon-env",
        )
    }
    files = tracked_files()
    # repo-local modules (scripts importing sibling scripts) are not leaks
    local_mods = {
        os.path.splitext(os.path.basename(f))[0] for f in files if f.endswith(".py")
    }
    for rel in files:
        path = os.path.join(REPO, rel)
        try:
            text = open(path, encoding="utf-8", errors="ignore").read()
        except OSError:
            continue
        if rel.endswith(".py"):
            for m in IMPORT_RE.finditer(text):
                root = (m.group(1) or m.group(2)).split(".")[0]
                if (
                    root not in PUBLIC_PKGS
                    and root not in _STDLIB
                    and root not in local_mods
                ):
                    hits["internal-import"].append(f"{rel}: import {root}")
            for m in ENV_RE.finditer(text):
                if not PUBLIC_ENV_RE.match(m.group(1)):
                    hits["axon-env"].append(f"{rel}: env {m.group(1)}")
        for m in URL_RE.finditer(text):
            if not PUBLIC_HOST_RE.search(m.group(0)):
                hits["internal-url"].append(f"{rel}: {m.group(0)}")
        for m in BUCKET_RE.finditer(text):
            hits["internal-bucket"].append(f"{rel}: {m.group(0)}")
        for m in SLACK_RE.finditer(text):
            hits["slack-link"].append(f"{rel}: {m.group(0)}")
        for m in KEY_RE.finditer(text):
            # NEVER write matched key material into the committed
            # artifact — the sweep must not itself re-leak what it
            # finds (ADVICE r9). Record a masked prefix + digest.
            secret = m.group(0)
            masked = secret[:4] + "****"
            digest = hashlib.sha256(secret.encode()).hexdigest()[:12]
            hits["api-key"].append(f"{rel}: {masked} (sha256:{digest})")
        # pip/requirements-style references to non-public packages
        for m in re.finditer(r"pip\s+install\s+([\w-]+)", text):
            if m.group(1).replace("-", "_") not in PUBLIC_PKGS:
                hits["internal-pkg2"].append(f"{rel}: pip install {m.group(1)}")
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        cwd=REPO, capture_output=True, text=True,
    ).stdout.strip()
    out = {
        "round": rnd,
        "generated_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_head": head,
        "n_files_scanned": len(tracked_files()),
        "n_hits": sum(len(v) for v in hits.values()),
        "hits": hits,
    }
    dest = os.path.join(REPO, "LEAKCHECK.json")
    with open(dest, "w") as fh:
        json.dump(out, fh, indent=2)
        fh.write("\n")
    print(json.dumps({k: len(v) for k, v in hits.items()}))
    for k, v in hits.items():
        for line in v[:20]:
            print(f"  {k}: {line}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
