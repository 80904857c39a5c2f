"""Docs-vs-bench consistency gate (VERDICT r3 weak #1 / task 3).

Round 3 shipped a stale throughput claim in docs/migration.md (a
debunked short-loop timer artifact, 15.97M cc/s, survived after
README/CHANGELOG were corrected). This test greps every prose surface
for the known-debunked figures so a stale number can never outlive its
correction again. Figures may only appear in an explicitly-marked
debunking context (the README's timer-hardening note).
"""

import re
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# Every figure the hardened timer debunked as physically impossible
# (bench.py _dev_time_per_iter rationale), plus retired setup claims.
DEBUNKED = [
    r"15\.97\s*M",          # r3 short-loop cc/s artifact
    r"48\.5\s*M",           # r2 min-of-5 artifact
    r"1\.125x its speed-of-light",
]

# Lines that *explain* the debunking are allowed to cite the figures.
ALLOW = re.compile(
    r"physically impossible|debunk|artifact|hardened|could read|wrong",
    re.IGNORECASE)

PROSE = [
    p for pat in ("*.md", "docs/*.md", "examples/*.py", "examples/*.md")
    for p in ROOT.glob(pat)
    if p.name not in ("VERDICT.md", "ADVICE.md", "PROGRESS.jsonl")
]


def test_no_stale_perf_claims():
    assert PROSE, "doc glob found nothing — repo layout changed?"
    offenders = []
    for path in PROSE:
        for lineno, line in enumerate(
                path.read_text(errors="replace").splitlines(), 1):
            for pat in DEBUNKED:
                if re.search(pat, line) and not ALLOW.search(line):
                    offenders.append(f"{path.relative_to(ROOT)}:{lineno}: "
                                     f"{line.strip()}")
    assert not offenders, (
        "stale debunked performance figures in docs:\n" +
        "\n".join(offenders))


def test_migration_md_matches_latest_bench():
    """The headline cc/s figure quoted in migration.md must match the
    most recent BENCH_r*.json within round-to-round noise (±20%)."""
    import json

    benches = sorted(ROOT.glob("BENCH_r*.json"))
    if not benches:
        return
    data = json.loads(benches[-1].read_text())
    parsed = data.get("parsed") or data
    value = parsed.get("value")
    if not value:
        return
    text = (ROOT / "docs" / "migration.md").read_text()
    m = re.search(r"([\d.]+)\s*M correlations/s", text)
    assert m, "migration.md no longer quotes a correlations/s figure"
    quoted = float(m.group(1)) * 1e6
    # a figure explicitly marked "to be pinned by BENCH_rNN" is exempt
    # UNTIL that bench file exists (the driver writes it at round end;
    # mid-round the doc may legitimately be ahead of the last bench)
    pin = re.search(r"to be pinned\s+by\s+(BENCH_r\d+)", text)
    if pin and not (ROOT / f"{pin.group(1)}.json").exists():
        return
    assert 0.8 <= quoted / value <= 1.25, (
        f"migration.md quotes {quoted/1e6:.2f}M cc/s but the latest "
        f"bench ({benches[-1].name}) measured {value/1e6:.2f}M — "
        "update the doc when the bench moves")
