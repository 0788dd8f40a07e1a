"""Repo hygiene scan: no private/internal references may ship.

Everything in this repo must derive from public knowledge (the PySpark
API, the public reference repo, published papers). This scan greps all
tracked source/docs for the categories of string that would violate
that: non-public package imports, non-public URLs, cloud-bucket URIs,
chat/workspace deep links, credential-shaped literals, and
private-looking environment variables. Writes LEAKCHECK.json (same
shape as the driver's artifact) and exits non-zero on any hit::

    python scripts/leakcheck.py [round_number]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Public/synthetic hosts that are expected to appear in docs/comments:
# RFC 2606 example.* and the reserved bare `.example` TLD (any
# subdomain, any case — test fixtures use HOST.Example.COM etc.), with
# an optional userinfo@ prefix (the hostile-URL sweep's credentialed
# fixtures), unicode-label hosts (the IDN case-fold sweep: the host run
# breaks at the first non-ASCII char, so whitelist an ASCII prefix
# followed by one), localhost, bare placeholder hosts, and the
# Apache/public-doc sites cited for provenance.
# END marks the end of the authority: the whitelisted host must be
# followed by a path/port/end — NOT by '@' (which would make it a
# userinfo decoy in front of a private host), another label char
# (ASCII *or* non-ASCII: the round-13 high-review found that an IDN
# char glued to a whitelisted token — example.comü.evil.corp —
# slipped the ASCII-only anchor), or a further dotted label
# (example.com.evil.corp must flag).
_END = r"(?![.@a-z0-9-]|[^\x00-\x7f])"
# Characters that can legitimately appear inside a hostname label:
# ASCII label chars, dots, or non-ASCII (IDN). An ALLOWLIST, not a
# delimiter denylist — the round-13 high-review showed any delimiter
# left off a denylist (comma, quote, paren ...) let the IDN whitelist
# scan slurp trailing prose to find '.example'.
_HOST_CHARS = r"(?:[a-z0-9.-]|[^\x00-\x7f])"
PUBLIC_URL = re.compile(
    r"https?://(?!("
    r"([a-z0-9:._-]+@)?("
    rf"([a-z0-9-]+\.)*example\.(com|org|net){_END}|"
    rf"([a-z0-9-]+\.)+example{_END})|"
    # unicode-label fixture hosts ONLY under the reserved .example TLD
    # (the IDN case-fold sweep): the authority is a run of HOST chars
    # (allowlist above — cannot cross whitespace, quotes, commas,
    # parens, '?#:' or any other delimiter into a query string or
    # trailing prose) containing at least one non-ASCII char and
    # ending at .example
    rf"{_HOST_CHARS}*[^\x00-\x7f]{_HOST_CHARS}*\.example{_END}|"
    rf"localhost{_END}|127\.0\.0\.1{_END}|host{_END}|"
    # the RFC 3849 IPv6 documentation prefix (the only bracket-literal
    # fixture class; any other IPv6 literal must flag)
    r"\[2001:db8:[0-9a-f:.]*\]|"
    rf"([a-z0-9-]+\.)*apache\.org{_END}|"
    # every doc-citation host gets the SAME end-of-authority anchor as
    # example/apache (round-13 review: the unanchored tokens re-opened
    # the decoy classes — github.com@internal.corp, duckdb.org.evil.corp
    # — that _END was added to close)
    rf"github\.com{_END}|raw\.githubusercontent\.com{_END}|"
    rf"arxiv\.org{_END}|doi\.org{_END}|"
    rf"duckdb\.org{_END}|docs\.python\.org{_END}|en\.wikipedia\.org{_END}|"
    rf"dl\.acm\.org{_END}|research\.google{_END}|openreview\.net{_END}|"
    rf"aclanthology\.org{_END}"
    # the flagging matcher must be able to MATCH any authority the
    # lookahead rejected: ASCII host chars, IDN chars, ports, and IPv6
    # bracket literals (round-13 high-review: the old ASCII-only
    # matcher could not even match a leading-non-ASCII or '['-literal
    # authority, so those private hosts shipped unflagged)
    rf"))(?:{_HOST_CHARS}|[\[\]:])+",
    re.IGNORECASE,
)

CHECKS: dict[str, re.Pattern[str]] = {
    # imports of packages that are neither stdlib/public-PyPI deps nor
    # this repo's own package
    # Two shapes: "import X[ as y]" and "from X import ...". The prose
    # guard on "from" is the trailing " import" requirement.
    "internal-import": re.compile(
        r"^\s*(?:import\s+|from\s+(?=\S+\s+import\b))(?!(?:hdfs_hive_sql_playground_spark|pyspark|"
        r"pandas|numpy|pyarrow|duckdb|pytest|hypothesis|py4j|google\.protobuf|"
        r"__future__|abc|argparse|array|base64|bisect|builtins|collections|"
        r"contextlib|copy|csv|dataclasses|datetime|decimal|difflib|enum|"
        r"errno|fractions|functools|gc|getpass|glob|gzip|hashlib|heapq|html|"
        r"http|importlib|inspect|io|itertools|json|logging|math|os|pathlib|"
        r"pickle|platform|queue|random|re\b|secrets|shlex|shutil|signal|"
        r"bench\b|gen_m33_fixture|__spark_entry__|leakcheck\b|"  # repo-local modules
        
        r"socket|sqlite3|stat|statistics|string|struct|subprocess|sys|"
        r"tempfile|textwrap|threading|time|traceback|types|typing|unicodedata|"
        r"unittest|urllib|uuid|warnings|weakref|zlib|zoneinfo)\b)[A-Za-z_][\w.]*",
        re.MULTILINE,
    ),
    "internal-url": PUBLIC_URL,
    # cloud storage URIs: none belong in a from-scratch public repo
    "internal-bucket": re.compile(r"\b(?:s3a?|gs|gcs|abfss?|wasbs?)://[\w./-]+"),
    # chat-workspace deep links / channel ids
    "slack-link": re.compile(r"slack\.com/|app\.slack|\b[A-Z]\d[A-Z0-9]{7,10}\b(?=.*slack)", re.IGNORECASE),
    # credential-shaped literals
    "api-key": re.compile(
        r"(?:api[_-]?key|secret|token|password)\s*[:=]\s*['\"][A-Za-z0-9+/_-]{16,}['\"]|"
        r"\bAKIA[0-9A-Z]{16}\b|\bsk-[A-Za-z0-9]{20,}\b",
        re.IGNORECASE,
    ),
    # env vars outside this repo's own SPARK_GRAFT_*/JAVA_HOME/standard set
    # — covers os.environ(...), os.environ.get(...), os.environ["..."],
    # and os.getenv("...") access forms with the same allowlist lookahead
    "private-env": re.compile(
        r"os\.(?:environ(?:\.get)?\s*[\(\[]|getenv\s*\()"
        r"\s*['\"](?!SPARK_GRAFT_|JAVA_HOME|PATH\b|"
        r"HOME\b|USER\b|TMPDIR|PYSPARK_|SPARK_|HADOOP_|TZ\b)[A-Z][A-Z0-9_]*"
    ),
}

SCAN_EXT = {".py", ".md", ".hql", ".sql", ".txt", ".json", ".toml", ".cfg", ".ini"}
# retrieved/judge artifacts, not repo source (ADVICE/VERDICT quote
# placeholder env-access code patterns as findings text)
SKIP_FILES = {"LEAKCHECK.json", "PAPERS.md", "SNIPPETS.md", "ADVICE.md", "VERDICT.md"}


def tracked_files() -> list[str]:
    out = subprocess.run(
        ["git", "ls-files"], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.splitlines()
    return [
        f
        for f in out
        if os.path.splitext(f)[1] in SCAN_EXT and os.path.basename(f) not in SKIP_FILES
    ]


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hits: dict[str, list[str]] = {k: [] for k in CHECKS}
    for rel in tracked_files():
        try:
            text = open(os.path.join(REPO, rel), encoding="utf-8").read()
        except (UnicodeDecodeError, OSError):
            continue
        ext = os.path.splitext(rel)[1]
        for name, pat in CHECKS.items():
            if name == "internal-import" and ext != ".py":
                continue  # prose "from the ..." lines are not imports
            for m in pat.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[name].append(f"{rel}:{line}: {m.group(0)[:80]}")
    n = sum(len(v) for v in hits.values())
    artifact = {
        "round": rnd,
        "n_hits": n,
        "hits": hits,
        "generated_by": "scripts/leakcheck.py (builder-side refresh)",
    }
    with open(os.path.join(REPO, "LEAKCHECK.json"), "w") as f:
        json.dump(artifact, f, indent=2)
        f.write("\n")
    print(f"LEAKCHECK round={rnd} n_hits={n}")
    for name, rows in hits.items():
        for r in rows[:20]:
            print(f"  {name}: {r}")
    return 1 if n else 0


if __name__ == "__main__":
    sys.exit(main())
